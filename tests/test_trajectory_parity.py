"""Bit-exact replay of the recorded parity fixture.

Feeds the actions of balatro_gym/balatro_trajectories.json into the SimEnv
engine and asserts per-step equality of every observation field, the reward,
and the done flag — the BASELINE 'trajectory parity' target.
"""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.core.cards import SUIT_NAMES
from balatro_gym_tpu.engine import sim_env

FIXTURE = Path("/root/reference/balatro_gym/balatro_trajectories.json")

pytestmark = pytest.mark.skipif(not FIXTURE.exists(), reason="fixture not mounted")


def _obs_from_state(st):
    """Project SimEnvState onto the fixture's observation schema."""
    n = int(st.hand_n)
    hand = []
    for i in range(n):
        r = int(st.hand_rank[i])
        s = SUIT_NAMES[int(st.hand_suit[i])]
        hand.append([r, s, "none"])
    return {
        "money": int(st.money),
        "ante": int(st.ante),
        "hands_left": int(st.hands_left),
        "discards_left": int(st.discards_left),
        "score": int(st.score),
        "blind_requirement": int(st.blind_requirement),
        "hand_cards": hand,
        "deck_size": int(st.deck_n),
        "consumables": 0,
        "jokers": [],
    }


def _assert_obs(got, want, where):
    for k in ("money", "ante", "hands_left", "discards_left", "score",
              "blind_requirement", "deck_size", "consumables", "jokers"):
        assert got[k] == want[k], (where, k, got[k], want[k])
    want_hand = [[c[0], c[1], c[2]] for c in want["hand_cards"]]
    assert got["hand_cards"] == want_hand, (where, got["hand_cards"], want_hand)


def _encode_action(a):
    idxs = a["card_indices"]
    assert idxs == list(range(len(idxs))), "fixture actions are prefixes"
    k = len(idxs)
    return (k - 1) if a["type"] == "play_hand" else (5 + k - 1)


@pytest.fixture(scope="module")
def trajectories():
    return json.loads(FIXTURE.read_text())


def test_replay_all_trajectories(trajectories):
    step = jax.jit(sim_env.step_action)
    for ti, traj in enumerate(trajectories):
        st = sim_env.reset(jax.random.key(ti))
        for si, tr in enumerate(traj):
            where = f"traj{ti}/step{si}"
            _assert_obs(_obs_from_state(st), tr["state"], where + "/pre")
            action = _encode_action(tr["action"])
            mask = np.asarray(sim_env.action_mask(st))
            assert mask[action], (where, "action must be legal", action, mask)
            st, reward, done = step(st, jnp.int32(action))
            assert float(reward) == pytest.approx(tr["reward"], abs=1e-9), (
                where, float(reward), tr["reward"])
            assert bool(done) == tr["done"], (where, bool(done), tr["done"])
            _assert_obs(_obs_from_state(st), tr["next_state"], where + "/post")


def test_final_scores(trajectories):
    """Spot-check the five terminal scores recorded in BASELINE.md."""
    finals = [traj[-1]["next_state"]["score"] for traj in trajectories]
    assert finals == [1208, 85, 68, 1234, 1026]


def test_vmapped_replay_matches_single(trajectories):
    """The same replay under vmap (batched lockstep) is bit-identical."""
    # Use trajectory 0's single action across a batch of 4 envs.
    B = 4
    keys = jax.random.split(jax.random.key(0), B)
    st = jax.vmap(sim_env.reset)(keys)
    action = jnp.full((B,), _encode_action(trajectories[0][0]["action"]), jnp.int32)
    st2, reward, done = jax.jit(jax.vmap(sim_env.step_action))(st, action)
    assert np.all(np.asarray(st2.score) == 1208)
    assert np.allclose(np.asarray(reward), 112.08)
    assert np.all(np.asarray(done))
