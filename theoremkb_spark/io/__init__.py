from .catalog import CheckpointedTripleStore  # noqa: F401
