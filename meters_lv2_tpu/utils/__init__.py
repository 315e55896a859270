from . import db, render, state, transport  # noqa: F401
