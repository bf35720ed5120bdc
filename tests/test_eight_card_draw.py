"""EightCardDraw env: contract, scoring, autoreset, and batched rollout."""
import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core.actions import (
    ACTION_SPACE_SIZE,
    FIVE_CARD_COMBOS,
    SELECT_OFFSET,
)
from balatro_gym_tpu.envs import eight_card_draw as ecd


def _code(rank, suit):
    return suit * 13 + (rank - 2)


def test_reset_deals_8_unique_cards():
    st = ecd.reset(jax.random.key(0))
    hand = np.asarray(st.hand)
    assert len(set(hand.tolist())) == 8
    assert int(st.phase) == 0
    # Deck is a permutation of 0..51 with the hand as its prefix.
    deck = np.asarray(st.deck)
    assert sorted(deck.tolist()) == list(range(52))
    assert deck[:8].tolist() == hand.tolist()


def test_discard_draws_from_deck_position_8():
    st = ecd.reset(jax.random.key(1))
    deck = np.asarray(st.deck)
    # Discard cards 0 and 3 -> replaced by deck[8], deck[9] (env.py:199-201).
    action = (1 << 0) | (1 << 3)
    st2, reward, done = jax.jit(ecd.step)(st, jnp.int32(action))
    hand = np.asarray(st2.hand)
    assert hand[0] == deck[8] and hand[3] == deck[9]
    assert float(reward) == 0.0 and not bool(done)
    assert int(st2.phase) == 1


def test_select_scores_royal_flush():
    st = ecd.reset(jax.random.key(2))
    # Plant a royal flush in slots 0-4.
    royal = jnp.asarray([_code(r, 3) for r in (10, 11, 12, 13, 14)] + [0, 1, 2],
                        jnp.int32)
    st = st.replace(hand=royal, phase=jnp.int32(1))
    action = SELECT_OFFSET + FIVE_CARD_COMBOS.index((0, 1, 2, 3, 4))
    st2, reward, done = jax.jit(ecd.step)(st, jnp.int32(action))
    # (100 + 51) * 8 / 1000 = 1.208 (chips_test.py royal value).
    assert abs(float(reward) - 1.208) < 1e-6
    assert bool(done)


def test_action_mask_per_phase():
    st = ecd.reset(jax.random.key(3))
    m0 = np.asarray(ecd.action_mask(st))
    assert m0[:256].all() and not m0[256:].any()
    st2, _, _ = ecd.step(st, jnp.int32(0))
    m1 = np.asarray(ecd.action_mask(st2))
    assert not m1[:256].any() and m1[256:].all()
    assert m0.shape == (ACTION_SPACE_SIZE,)


def test_autoreset_redeals():
    st = ecd.reset(jax.random.key(4))
    st, _, _ = ecd.step(st, jnp.int32(0))
    st2, reward, done = jax.jit(ecd.step_autoreset)(st, jnp.int32(SELECT_OFFSET))
    assert bool(done) and float(reward) > 0
    assert int(st2.phase) == 0 and not bool(st2.terminated)


def test_vmapped_rollout_runs():
    _, total, eps = jax.jit(ecd.rollout, static_argnums=(1, 2))(
        jax.random.key(0), 64, 10)
    # 10 steps of 2-step episodes -> 5 episodes per env.
    assert int(eps) == 64 * 5
    assert float(total) > 0


def test_gym_shell_contract():
    env = ecd.make("EightCardDraw-v0")
    obs, info = env.reset(seed=7)
    assert obs["cards"].shape == (8, 52)
    assert obs["cards"].sum() == 8
    assert int(obs["phase"]) == 0
    obs, r, term, trunc, _ = env.step(0)  # discard nothing
    assert not term and r == 0.0
    legal = np.flatnonzero(obs["action_mask"])
    obs, r, term, trunc, _ = env.step(int(legal[0]))
    assert term and r > 0
    # Same seed => same deal (determinism).
    env2 = ecd.make("EightCardDraw-v0")
    o1, _ = env.reset(seed=42)
    o2, _ = env2.reset(seed=42)
    assert np.array_equal(o1["cards"], o2["cards"])


def test_score_five_matches_oracle():
    """score_five == (base + card chips) * mult / 1000 via the python oracle."""
    from balatro_gym_tpu.core.constants import BASE_HAND_CHIPS, BASE_HAND_MULT
    from balatro_gym_tpu.oracle.hand_oracle import classify_env_oracle

    rng = np.random.default_rng(0)
    f = jax.jit(ecd.score_five)
    for _ in range(50):
        hand = rng.choice(52, size=8, replace=False).astype(np.int32)
        keep_idx = rng.choice(8, size=5, replace=False)
        keep = np.zeros(8, bool)
        keep[keep_idx] = True
        cards = [(int(c) % 13 + 2, int(c) // 13) for c in hand[keep]]
        ht = classify_env_oracle(cards)
        chips = int(BASE_HAND_CHIPS[ht]) + sum(
            min(r, 10) if r <= 13 else 11 for r, _ in cards)
        want = chips * int(BASE_HAND_MULT[ht]) / 1000.0
        got = float(f(jnp.asarray(hand), jnp.asarray(keep)))
        assert abs(got - want) < 1e-6, (hand, keep, got, want)
