from st_dadk_tpu.ops.basis import (  # noqa: F401
    CALIBRATION_FACTORS,
    wendland_c4,
    gaussian_rbf,
    triangular_basis,
    apply_basis,
    spatial_basis_embed,
    temporal_basis_embed,
    uniform_grid_centers,
    temporal_grid_centers,
)
from st_dadk_tpu.ops.losses import (  # noqa: F401
    quantile_loss,
    multi_quantile_loss,
    non_crossing_penalty,
    p_nc_delta_penalty,
    check_loss_np,
    compute_crps,
    compute_crps_multi_quantile,
)
