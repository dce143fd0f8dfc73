from .step import make_train_step, make_sharded_train_step, mse_loss

__all__ = ["make_train_step", "make_sharded_train_step", "mse_loss"]
