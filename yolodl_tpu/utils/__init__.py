from .timing import RateCounter, Timing  # noqa: F401
