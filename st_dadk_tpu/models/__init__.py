from st_dadk_tpu.models.st_interp import (  # noqa: F401
    ModelSpec,
    spec_from_config,
    init_model,
    forward,
    domain_penalty,
    movement_penalty,
    sparsity_penalty,
)
