from .graph import connected_components  # noqa: F401
from .joins import salted_join  # noqa: F401
