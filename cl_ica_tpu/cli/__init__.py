"""Experiment CLIs mirroring the reference drivers flag-for-flag.

main_mlp      ← /root/reference/main_mlp.py      (README.md:13-58)
main_3dident  ← /root/reference/main_3dident.py  (README.md:59-147)
main_kitti    ← /root/reference/main_kitti.py    (README.md:148-188)
"""
