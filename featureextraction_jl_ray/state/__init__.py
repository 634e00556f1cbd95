from .moments import Moments, fit_moments
from .pca import PCAModel, fit_pca
from .kernel import KernelCenterer
from .kpca import KpcaModel, fit_kpca, apply_kpca_transform

__all__ = [
    "Moments",
    "fit_moments",
    "PCAModel",
    "fit_pca",
    "KernelCenterer",
    "KpcaModel",
    "fit_kpca",
    "apply_kpca_transform",
]
