from tdr.train.contrastive import (
    TrainState,
    create_train_state,
    contrastive_loss,
    make_train_step,
    shard_train_state,
    train_dense_retriever,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "contrastive_loss",
    "make_train_step",
    "shard_train_state",
    "train_dense_retriever",
]
