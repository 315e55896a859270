from . import db, render, state  # noqa: F401
