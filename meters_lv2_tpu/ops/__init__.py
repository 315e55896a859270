from . import ballistics, design, fft, hist, lti, resample  # noqa: F401
