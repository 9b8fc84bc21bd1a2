from st_dadk_tpu.sweep.grid import (  # noqa: F401
    generate_config_combinations,
    save_experiment_results,
    run_grid_search,
)
