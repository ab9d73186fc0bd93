from . import config, datasets, evaluation, synthetic, trajectory

__all__ = ["config", "datasets", "evaluation", "synthetic", "trajectory"]
