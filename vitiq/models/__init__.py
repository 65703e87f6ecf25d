from vitiq.models.amc import init_amc_params, make_forward, count_parameters  # noqa: F401
