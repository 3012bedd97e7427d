from semtpu.models.multires_unet import MultiResUNet
from semtpu.models.wgan import WGANGenerator, WGANDiscriminator
from semtpu.models.cyclegan import ResNetGenerator, PatchGANDiscriminator
from semtpu.models.classifier import ParticleClassifier
