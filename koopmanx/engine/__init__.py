from .loop import EngineConfig, LoopCarry, MPCParams, StepLog, make_closed_loop, run_batch
from . import ref
from .controller import BatchedController, Controller, ControllerState
from .local_linear import make_local_linear_loop
from .scenario import ScenarioBatch, replicate_scenario, sample_scenarios
