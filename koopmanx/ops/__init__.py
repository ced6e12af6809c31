from .qp_pallas import FusedQPConfig, fused_qp_solve
from .qp_pallas_soa import fused_qp_solve_soa

try:  # native C++ oracle is optional (needs a toolchain)
    from . import native
except Exception:  # pragma: no cover
    native = None
