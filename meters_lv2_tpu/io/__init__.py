from . import batch, wav  # noqa: F401
from .wav import read_wav, write_wav  # noqa: F401
