from .metrics import (
    mean_update_norms,
    openloop_rmse,
    rmse,
    steady_state_error,
    tracking_mse,
)
from .openloop import OpenLoopResult, openloop_validate
from .modes import (
    KoopmanSpectrum,
    eigenfunctions,
    mode_amplitudes,
    reconstruct_prediction,
    spectral_decomposition,
    spectrum_summary,
)
from .persist import archive_run, load_pytree, save_pytree
