from semtpu.utils.profiling import trace, StepTimer
