from tdr.train.contrastive import (
    TrainState,
    create_train_state,
    contrastive_loss,
    make_train_step,
    shard_train_state,
    train_dense_retriever,
)
from tdr.train.mining import (
    concat_querysets,
    make_pseudo_queries,
    mine_hard_negatives,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "contrastive_loss",
    "make_train_step",
    "shard_train_state",
    "train_dense_retriever",
    "concat_querysets",
    "make_pseudo_queries",
    "mine_hard_negatives",
]
