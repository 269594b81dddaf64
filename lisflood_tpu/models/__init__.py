from .config import ModelConfig
from .initial import build_model
from .step import build_step
from .driver import LisfloodRunner, lisfloodexe

__all__ = ["ModelConfig", "build_model", "build_step", "LisfloodRunner", "lisfloodexe"]
