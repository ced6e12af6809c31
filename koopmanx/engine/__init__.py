from .loop import EngineConfig, LoopCarry, MPCParams, StepLog, make_closed_loop, run_batch
from . import ref
