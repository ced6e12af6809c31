from .condensed import (
    PredictionMatrices,
    augment_delta_u,
    condensed_qp,
    prediction_matrices,
    weight_bar,
)
from .dare import controllability_rank, dlqr, dlqr_gain, solve_dare_doubling, solve_dare_iter
from .qp import ADMMConfig, solve_box_qp, solve_qp, solve_qp_batch
from .shooting import PGDConfig, shooting_cost, solve_shooting_pgd
from .terminal import (
    TerminalCert,
    ellipsoid_radius,
    lifted_residual,
    lyapunov_value,
    prediction_residual,
    synthesize_terminal,
)
from .lmi import LMIResult, solve_terminal_lmi
from .dare import solve_dlyap_doubling
from .terminal import compensator_term, gamma_margin
