from . import ballistics, design, lti, resample  # noqa: F401
