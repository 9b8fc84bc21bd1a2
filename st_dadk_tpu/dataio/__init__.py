from st_dadk_tpu.dataio.kaust import (  # noqa: F401
    load_kaust_csv_single,
    load_kaust_csv,
    sample_observed_sites,
    predictions_to_csv,
)
from st_dadk_tpu.dataio.obs_design import (  # noqa: F401
    spatial_obs_probs,
    sample_observations,
    split_train_valid,
)
from st_dadk_tpu.dataio.arrays import (  # noqa: F401
    PointSet,
    pointset_from_mask,
    pad_pointset,
    dense_grid_points,
)
