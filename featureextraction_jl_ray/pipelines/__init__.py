from .flagship import FlagshipConfig, fit_flagship_model, run_flagship, resume_flagship

__all__ = ["FlagshipConfig", "fit_flagship_model", "run_flagship", "resume_flagship"]
