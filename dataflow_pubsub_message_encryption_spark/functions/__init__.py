from . import crypto, normalize, textfns, vectors  # noqa: F401
