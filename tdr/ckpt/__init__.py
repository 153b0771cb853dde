from tdr.ckpt.registry import (
    save_registry,
    load_registry,
    save_sparse_model,
    load_sparse_model,
    save_dense_model,
    load_dense_model,
    save_train_state,
    load_train_state,
    save_segmented,
    load_segmented,
    recover_segmented_dir,
)

__all__ = [
    "save_registry",
    "load_registry",
    "save_sparse_model",
    "load_sparse_model",
    "save_dense_model",
    "load_dense_model",
    "save_train_state",
    "load_train_state",
    "save_segmented",
    "load_segmented",
    "recover_segmented_dir",
]
