from .base import (
    System,
    make_constant_schedule,
    make_step,
    make_switch_schedule,
    rk4_step,
    rk4_step_k1k4,
)
from .data import Snapshots, collect, from_reference_layout, rollout
from .library import (
    APPROACH3,
    DUFFING,
    REGISTRY,
    TANK,
    TOY1D,
    VANDERPOL,
    get_system,
)
from .linearize import (
    affine_residual,
    batch_linearize_discrete,
    linearize_continuous,
    linearize_discrete,
)
