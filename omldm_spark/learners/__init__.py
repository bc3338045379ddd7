from .base import LEARNER_REGISTRY, Learner, get_learner  # noqa: F401
from . import linear  # noqa: F401  (registers PA, RegressorPA, MultiClassPA, SVM)
from . import kmeans  # noqa: F401  (registers K-means)
from . import orr  # noqa: F401
from . import nn  # noqa: F401  (registers NN)
from . import ht  # noqa: F401  (registers HT)
