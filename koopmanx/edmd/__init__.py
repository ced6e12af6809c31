from .batch import (
    GramStats,
    combine_gram_stats,
    edmd_fit,
    edmd_fit_pinv_direct,
    fit_from_grams,
    gram_stats,
    lift_snapshots,
)
from .rls import (
    StorageState,
    rls_init,
    rls_init_from_grams,
    rls_update_ab,
    rls_update_c,
    storage_init,
    storage_model,
    storage_update,
)
