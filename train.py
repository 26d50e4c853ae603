"""Repo-root launcher (parity with the reference's top-level train.py):

    python train.py task=Cartpole num_envs=256 max_iterations=50
"""
from isaacgymenvs_ma_tpu.train import launch

if __name__ == "__main__":
    launch()
