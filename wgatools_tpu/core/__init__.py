from .natsort import natural_cmp, natural_key  # noqa: F401
from .strand import Strand  # noqa: F401
