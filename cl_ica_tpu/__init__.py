"""cl_ica_tpu — a TPU-native contrastive-identifiability framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
brendel-group/cl-ica ("Contrastive Learning Inverts the Data Generating
Process", ICML 2021): latent-space samplers, invertible mixing networks,
InfoNCE-family losses, encoders (MLP/conv/ResNet), and identifiability
metrics (MCC, linear R²) — all designed TPU-first:

  * every sampler is a pure function of a PRNG key and is jit/vmap-able,
  * the whole training step (sampling → mixing → encoder → loss → Adam)
    compiles to a single XLA program per device,
  * the B×B InfoNCE similarity matrix rides the MXU (p=2 fast path) or a
    fused Pallas kernel (general Lp) and shards across a device mesh with
    global negatives,
  * evaluation metrics run as closed-form JAX computations with a
    host-side Hungarian assignment (n≈10).

Layer map mirrors the reference (see SURVEY.md §1):
  spaces/      ← reference spaces.py, spaces_utils.py, vmf.py, latent_spaces.py
  models/      ← reference encoders.py, layers.py, invertible_network_utils.py,
                  kitti_masks/model.py
  losses/      ← reference losses.py
  ops/         ← Pallas kernels (fused Lp-InfoNCE, batched k-NN) —
                  the TPU-native replacements for cuBLAS/cuDNN/FAISS paths
  evaluation/  ← reference disentanglement_utils.py, munkres.py,
                  kitti_masks/mcc_metric/
  data/        ← reference datasets/, kitti_masks/dataset.py, infinite_iterator.py
  train/       ← the shared trainer the reference lacks (each reference CLI
                  re-implements its loop; here there is one jitted step)
  parallel/    ← mesh + sharded global-batch InfoNCE (reference analog:
                  torch DataParallel at main_3dident.py:373)
  cli/         ← reference main_mlp.py / main_3dident.py / main_kitti.py
                  flag-for-flag
"""

__version__ = "0.1.0"
