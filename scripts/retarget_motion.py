"""Offline motion retargeting CLI (reference
tasks/amp/poselib/retarget_motion.py): map a source .npy motion onto a
target skeleton via a T-pose joint mapping.

Usage:
    python scripts/retarget_motion.py config.json
with config keys (same schema as the reference's retarget config):
    source_motion, source_tpose, target_tpose, target_motion_path,
    joint_mapping {src: tgt}, rotation (optional xyzw), scale (optional).
T-pose .npy files hold a SkeletonState dict; motions hold SkeletonMotion
dicts (poselib format).
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from isaacgymenvs_ma_tpu.poselib import SkeletonMotion, SkeletonState  # noqa: E402


def main(cfg_path: str):
    with open(cfg_path) as f:
        cfg = json.load(f)
    motion = SkeletonMotion.from_file(cfg["source_motion"])
    src_tpose = SkeletonState.from_dict(
        np.load(cfg["source_tpose"], allow_pickle=True).item())
    tgt_tpose = SkeletonState.from_dict(
        np.load(cfg["target_tpose"], allow_pickle=True).item())
    rot = np.asarray(cfg.get("rotation", [0.0, 0, 0, 1.0]), np.float32)
    out = motion.retarget_to_by_tpose(
        cfg["joint_mapping"], src_tpose, tgt_tpose,
        rotation_to_target_skeleton=rot,
        scale_to_target_skeleton=float(cfg.get("scale", 1.0)))
    out.to_file(cfg["target_motion_path"])
    print(f"retargeted {motion.num_frames} frames -> "
          f"{cfg['target_motion_path']}")


if __name__ == "__main__":
    main(sys.argv[1])
