"""Terrain subsystem tests: generators, curriculum map, height lookup."""
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_ma_tpu.physics.terrain import (CurriculumTerrain, SubTerrain,
                                                 TerrainGrid,
                                                 pyramid_sloped_terrain,
                                                 pyramid_stairs_terrain,
                                                 random_uniform_terrain,
                                                 stairs_terrain,
                                                 stepping_stones_terrain)


def test_generators_shapes():
    t = SubTerrain(width=80, length=80)
    random_uniform_terrain(t, -0.05, 0.05, 0.005, downsampled_scale=0.2,
                           rng=np.random.default_rng(0))
    assert t.height_field_raw.std() > 0
    t2 = SubTerrain(width=80, length=80)
    stairs_terrain(t2, step_width=0.75, step_height=0.1)
    assert t2.height_field_raw.max() > 0
    t3 = SubTerrain(width=80, length=80)
    pyramid_stairs_terrain(t3, 0.31, 0.1, platform_size=3.0)
    assert t3.height_field_raw.max() > 0
    t4 = SubTerrain(width=80, length=80)
    stepping_stones_terrain(t4, 1.0, 0.25, 0.0, rng=np.random.default_rng(1))
    assert t4.height_field_raw.min() < -100  # pits


def test_bilinear_lookup():
    heights = jnp.asarray(np.outer(np.arange(10), np.ones(10)), jnp.float32)
    grid = TerrainGrid(heights=heights, horizontal_scale=1.0, origin_xy=(0.0, 0.0))
    # height rises 1 per meter in x
    h = grid.height_at(jnp.array([2.5]), jnp.array([3.0]))
    assert abs(float(h[0]) - 2.5) < 1e-5
    h2 = grid.height_min2(jnp.array([2.5]), jnp.array([3.0]))
    assert abs(float(h2[0]) - 2.0) < 1e-5  # min-of-two is conservative


def test_curriculum_map():
    cm = CurriculumTerrain(num_levels=3, num_types=4, terrain_width=4.0,
                           terrain_length=4.0, border_size=4.0)
    assert cm.env_origins.shape == (3, 4, 3)
    # origins lie inside the map and at sane heights
    W, L = cm.grid.heights.shape
    assert (cm.env_origins[..., 0] > 0).all()
    assert (np.abs(cm.env_origins[..., 2]) < 5).all()
