"""Experiment CLIs mirroring the reference drivers flag-for-flag.

main_mlp      ← /root/reference/main_mlp.py      (README.md:13-58)
main_3dident  ← /root/reference/main_3dident.py  (README.md:59-147)
main_kitti    ← /root/reference/main_kitti.py    (README.md:148-188)
"""


def fused_arg(args):
    """Map --fused-loss/--no-fused-loss to a use_fused value
    (None = auto-route on TPU). --no-fused-loss wins when both are
    passed — single definition of the precedence for all drivers."""
    if getattr(args, "no_fused_loss", False):
        return False
    if getattr(args, "fused_loss", False):
        return True
    return None
