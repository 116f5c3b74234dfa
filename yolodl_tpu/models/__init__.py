from .builder import YoloModel  # noqa: F401
