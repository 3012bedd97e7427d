from semtpu.sim.noise import perlin_field
from semtpu.sim.simulator import MaskSimulator, SimulatorConfig
