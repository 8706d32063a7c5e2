from .toy import inf_train_gen  # noqa: F401
