"""Arena state clone/serialize round trips + ArenaConfig custom pads."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlgymppo_cpp_tpu.sim.arena import Arena
from rlgymppo_cpp_tpu.sim.arena_config import ArenaConfig
from rlgymppo_cpp_tpu.sim.constants import GameMode
from rlgymppo_cpp_tpu.sim.serialize import clone_state, save_state, load_state
from rlgymppo_cpp_tpu.sim.state import CarControls


def test_clone_and_serialize_roundtrip(tmp_path):
    arena = Arena(game_mode=GameMode.SOCCAR, teams=(0, 1))
    st = arena.default_state((2,))
    st, _ = arena.step(st, CarControls.zeros((2, 2)),
                       jax.random.PRNGKey(0), 8)

    c = clone_state(st)
    np.testing.assert_array_equal(np.asarray(c.cars.pos),
                                  np.asarray(st.cars.pos))

    path = str(tmp_path / "state.npz")
    save_state(path, st)
    template = arena.default_state((2,))
    loaded = load_state(path, template)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(st)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Shape mismatch is rejected (structural validation)
    bad_template = arena.default_state((3,))
    with pytest.raises(ValueError):
        load_state(path, bad_template)


def test_custom_boost_pads():
    pads = [(0.0, 0.0, 70.0), (1000.0, 0.0, 70.0)]
    cfg = ArenaConfig(custom_boost_pads=pads,
                      custom_boost_pads_is_big=[True, False])
    arena = Arena(game_mode=GameMode.SOCCAR, teams=(0,), arena_config=cfg)
    assert arena.num_pads == 2
    assert bool(arena.pad_is_big[0]) and not bool(arena.pad_is_big[1])

    # Car parked on the big pad picks up boost on step
    st = arena.default_state((1,))
    cars = st.cars.replace(
        pos=jnp.asarray([[[0.0, 0.0, 17.0]]]),
        boost=jnp.asarray([[10.0]]))
    st = st.replace(cars=cars)
    st2, ev = arena.step(st, CarControls.zeros((1, 1)),
                         jax.random.PRNGKey(0), 8)
    assert float(st2.cars.boost[0, 0]) == 100.0   # big pad fills to max
    assert int(ev["pickup"][0, 0]) == 1
