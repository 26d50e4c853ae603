"""poselib: FK correctness, local/global roundtrip, velocities, retarget."""
import numpy as np
import pytest

from isaacgymenvs_ma_tpu.poselib import (SkeletonMotion, SkeletonState,
                                         SkeletonTree, quat_from_angle_axis,
                                         quat_mul, quat_rotate)


def _chain3():
    # root -> a(+x 1) -> b(+x 1)
    return SkeletonTree(["root", "a", "b"], np.array([-1, 0, 1]),
                        np.array([[0, 0, 0], [1, 0, 0], [1, 0, 0]],
                                 np.float32))


def test_fk_straight_and_bent():
    tree = _chain3()
    st = SkeletonState.zero_pose(tree)
    gt = st.global_translation
    assert np.allclose(gt, [[0, 0, 0], [1, 0, 0], [2, 0, 0]], atol=1e-6)
    # bend 90 deg at root about z: a at (0,1,0), b at (0,2,0)
    rz = quat_from_angle_axis(np.pi / 2, [0, 0, 1.0])
    lr = st.local_rotation.copy()
    lr[0] = rz
    st2 = SkeletonState(tree, lr, st.root_translation)
    gt2 = st2.global_translation
    assert np.allclose(gt2, [[0, 0, 0], [0, 1, 0], [0, 2, 0]], atol=1e-5)


def test_local_global_roundtrip():
    tree = _chain3()
    rng = np.random.default_rng(0)
    lr = rng.normal(size=(3, 4)).astype(np.float32)
    lr /= np.linalg.norm(lr, axis=-1, keepdims=True)
    st = SkeletonState(tree, lr, np.zeros(3, np.float32))
    gr = st.global_rotation
    st2 = SkeletonState.from_rotation_and_root_translation(
        tree, gr, np.zeros(3), is_local=False)
    # same global rotations (local reps may differ by sign)
    assert np.allclose(np.abs(np.sum(st2.global_rotation * gr, -1)), 1.0,
                       atol=1e-5)


def test_motion_velocities_and_npy_roundtrip(tmp_path):
    tree = _chain3()
    T, fps = 30, 30.0
    lr = np.tile(SkeletonState.zero_pose(tree).local_rotation, (T, 1, 1))
    # root translates at 1 m/s in +x
    rt = np.stack([np.linspace(0, 1, T), np.zeros(T), np.zeros(T)], -1)
    mo = SkeletonMotion(tree, lr, rt.astype(np.float32), fps)
    v = mo.global_velocity
    assert np.allclose(v[5:-5, 0, 0], 1.0 * (T - 1) / T / 1.0, atol=0.1)
    assert np.allclose(mo.global_angular_velocity, 0.0, atol=1e-4)
    p = str(tmp_path / "m.npy")
    mo.to_file(p)
    mo2 = SkeletonMotion.from_file(p)
    assert mo2.fps == fps
    assert np.allclose(mo2.global_translation, mo.global_translation)
    d = mo2.to_dict()
    # reference poselib tensor-dict layout ({"arr": ...} wrapping)
    assert d["rotation"]["arr"].shape == (T, 3, 4)
    assert d["global_velocity"]["arr"].shape == (T, 3, 3)


def test_keep_drop_nodes():
    tree = _chain3()
    t2 = tree.keep_nodes_by_names(["root", "b"])
    assert t2.node_names == ["root", "b"]
    # b's accumulated local translation = a + b offsets
    assert np.allclose(t2.local_translation[1], [2, 0, 0])
    st = SkeletonState.zero_pose(t2)
    assert np.allclose(st.global_translation[1], [2, 0, 0])


def test_retarget_identity_mapping():
    tree = _chain3()
    T = 8
    rng = np.random.default_rng(1)
    lr = rng.normal(size=(T, 3, 4)).astype(np.float32)
    lr /= np.linalg.norm(lr, axis=-1, keepdims=True)
    rt = rng.normal(size=(T, 3)).astype(np.float32)
    mo = SkeletonMotion(tree, lr, rt, 30.0)
    tpose = SkeletonState.zero_pose(tree)
    out = mo.retarget_to_by_tpose(
        {"root": "root", "a": "a", "b": "b"}, tpose, tpose)
    assert np.allclose(out.global_translation, mo.global_translation,
                       atol=1e-4)


def test_from_mjcf_humanoid():
    tree = SkeletonTree.from_mjcf("/root/reference/assets/mjcf/nv_humanoid.xml")
    assert "torso" in tree.node_names
    assert len(tree) >= 10
    assert int(tree.parent_indices[0]) == -1


def test_fbx_gated():
    with pytest.raises(ImportError):
        SkeletonMotion.from_fbx("x.fbx")
