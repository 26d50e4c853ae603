"""One-time codegen: parse robot description assets into checked-in Python
specs (isaacgymenvs_ma_tpu/models/specs/*.py) so the framework is standalone.

The physical descriptions (MuJoCo humanoid etc.) are standard published robot
models; we ship them as data in our own spec format, produced through our MJCF
parser.  Re-run when the parser or source assets change.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from isaacgymenvs_ma_tpu.models.mjcf import load_mjcf
from isaacgymenvs_ma_tpu.models.urdf import load_urdf
from isaacgymenvs_ma_tpu.models.model import model_to_spec

OUT = os.path.join(os.path.dirname(__file__), "..", "isaacgymenvs_ma_tpu", "models", "specs")

ASSETS = {
    "humanoid": "/root/reference/assets/mjcf/nv_humanoid.xml",
    "amp_humanoid": "/root/reference/assets/mjcf/amp_humanoid.xml",
    "shadow_hand": "/root/reference/assets/mjcf/open_ai_assets/hand/shadow_hand.xml",
}

URDF_ASSETS = {
    # collapse_fixed mirrors Anymal's asset options (tasks/anymal.py:171-181)
    "anymal": ("/root/reference/assets/urdf/anymal_c/urdf/anymal.urdf",
               dict(collapse_fixed=True)),
    # kinematics only (mesh collisions / no inertials in the source URDF);
    # mass properties and contact geoms are attached in models/franka.py
    "franka_panda": (
        "/root/reference/assets/urdf/franka_description/robots/franka_panda_gripper.urdf",
        dict(fix_base_link=True)),
    # mesh collisions skipped; fingertip contact boxes attached in the task
    "allegro_hand": (
        "/root/reference/assets/urdf/kuka_allegro_description/allegro_touch_sensor.urdf",
        dict(fix_base_link=True)),
    # KUKA iiwa7 + Allegro hand (allegro_kuka_base.py asset kukaAllegro);
    # mesh collisions approximated by fingertip/palm contact geoms in the task
    "kuka_allegro": (
        "/root/reference/assets/urdf/kuka_allegro_description/kuka_allegro_touch_sensor.urdf",
        dict(fix_base_link=True, collapse_fixed=True)),
    # tri-finger platform (tasks/trifinger.py:181 robot urdf); mesh collisions
    # skipped — fingertip contact spheres attached in the task
    "trifinger": (
        "/root/reference/assets/trifinger/robot_properties_fingers/urdf/pro/trifingerpro.urdf",
        dict(fix_base_link=True, collapse_fixed=True)),
}

TEMPLATE = '''"""Auto-generated robot spec ({name}) — produced by scripts/gen_robot_specs.py.

Physical description of the standard {name} model (see the published MuJoCo
model family), serialized through our MJCF parser into the SceneModel spec
format.  Load with ``models.model.model_from_spec(SPEC)``.
"""

SPEC = {spec}
'''


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, path in ASSETS.items():
        if not os.path.exists(path):
            print(f"skip {name}: {path} not found")
            continue
        m = load_mjcf(path)
        spec = model_to_spec(m)
        text = TEMPLATE.format(name=name, spec=repr(spec))
        with open(os.path.join(OUT, f"{name}.py"), "w") as f:
            f.write(text)
        print(f"wrote {name}: nb={m.nb} nv={m.nv} geoms={len(m.geoms)}")
    for name, (path, opts) in URDF_ASSETS.items():
        if not os.path.exists(path):
            print(f"skip {name}: {path} not found")
            continue
        m = load_urdf(path, **opts)
        text = TEMPLATE.format(name=name, spec=repr(model_to_spec(m)))
        with open(os.path.join(OUT, f"{name}.py"), "w") as f:
            f.write(text)
        print(f"wrote {name}: nb={m.nb} nv={m.nv} geoms={len(m.geoms)}")


if __name__ == "__main__":
    main()
