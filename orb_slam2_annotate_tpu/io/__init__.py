from . import checkpoint, config, datasets, evaluation, synthetic, trajectory

__all__ = ["checkpoint", "config", "datasets", "evaluation", "synthetic", "trajectory"]
