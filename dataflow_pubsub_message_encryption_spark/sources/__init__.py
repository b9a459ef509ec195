from .fixtures import TABLES, load, load_events, with_envelope  # noqa: F401
