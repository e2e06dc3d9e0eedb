"""Multi-chip scale-out: mesh + sharded global-batch InfoNCE.

Reference analog: single-host torch DataParallel (main_3dident.py:373) —
batch scattered across GPUs, loss computed on the gathered full batch so
negatives are always global (SURVEY.md §7 "DataParallel semantics").

TPU-native design: a jax.sharding.Mesh with a 'data' axis; batches carry
NamedSharding(P('data')); parameters are replicated; the B×B InfoNCE
similarity matrix is computed row-sharded, with XLA inserting the
all-gather of the negatives' codes over ICI. Every chip holds B/n_chips
rows of the similarity matrix — the quadratic object never materializes
unsharded — and the loss mean reduces with a psum. This reproduces
global-negative semantics exactly while the collective rides ICI.
"""

from .mesh import make_mesh, make_dp_tp_mesh, data_sharding, replicated
from .collective import (
    gspmd_safe_loss,
    sharded_lp_neg_lse,
    sharded_lp_simclr_loss,
    sharded_store_gather,
    shardmap_cl_loss,
    store_gather_shardmap,
)
from .sharded import (
    make_sharded_synthetic_train_step,
    make_sharded_data_train_step,
    make_sharded_3dident_train_step,
    make_sharded_3dident_sup_step,
    pad_rows_to_multiple,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_dp_tp_mesh",
    "data_sharding",
    "replicated",
    "make_sharded_synthetic_train_step",
    "make_sharded_data_train_step",
    "shard_batch",
    "gspmd_safe_loss",
    "shardmap_cl_loss",
    "sharded_lp_neg_lse",
    "sharded_lp_simclr_loss",
    "sharded_store_gather",
    "store_gather_shardmap",
    "make_sharded_3dident_train_step",
    "make_sharded_3dident_sup_step",
    "pad_rows_to_multiple",
]
