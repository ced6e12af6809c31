from .profiling import StepTimer, solves_per_second, time_jitted, trace
