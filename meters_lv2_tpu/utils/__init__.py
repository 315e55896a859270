from . import db, state  # noqa: F401
