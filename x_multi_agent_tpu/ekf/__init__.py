from .state import StateDims, CoreState, VisionState, FilterState  # noqa: F401
