from .pfp_names import PFPNameError, parse_variable_name  # noqa: F401
from .std_names import STD_NAMES  # noqa: F401
from .site import SITE_DETAIL_FIELDS, site_details_df  # noqa: F401
from .variables import build_site_variables, plausible_bounds, units_nonconforming  # noqa: F401
