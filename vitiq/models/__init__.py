from vitiq.models.amc import init_amc_params, make_forward, count_parameters  # noqa: F401
from vitiq.models.mdf import create_multi_domain_model  # noqa: F401
