from .step import make_train_step, make_sharded_train_step, mse_loss, \
    shard_batch


def __getattr__(name):
    # heavier pieces load lazily (data pulls the resize stack, trainer
    # pulls optax)
    if name in ("dataset_from_dir", "patches_from_image",
                "iterate_minibatches"):
        from . import data

        return getattr(data, name)
    if name == "fit":
        from .trainer import fit

        return fit
    raise AttributeError(name)


__all__ = ["make_train_step", "make_sharded_train_step", "mse_loss",
           "shard_batch", "fit", "dataset_from_dir", "patches_from_image",
           "iterate_minibatches"]
