from st_dadk_tpu.parallel.mesh import make_mesh, lane_sharding, replicated  # noqa: F401
from st_dadk_tpu.parallel.data_parallel import make_dp_train_step  # noqa: F401
