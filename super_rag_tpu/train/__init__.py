from super_rag_tpu.train.contrastive import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
    param_shardings,
    train_mesh,
)

__all__ = [
    "TrainConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "param_shardings",
    "train_mesh",
]
