from .moments import Moments, fit_moments
from .pca import PCAModel, fit_pca
from .kernel import KernelCenterer

__all__ = ["Moments", "fit_moments", "PCAModel", "fit_pca", "KernelCenterer"]
