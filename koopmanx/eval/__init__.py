from .metrics import (
    mean_update_norms,
    openloop_rmse,
    rmse,
    steady_state_error,
    tracking_mse,
)
from .openloop import OpenLoopResult, openloop_validate
