"""Single-blind simulator environment ("SimEnv") — the parity-fixture engine.

Mirrors the trajectory generator's game loop
(balatro_gym/balatro_sim_test.py:33-441): a standard 52-card deck built
Hearts→Diamonds→Clubs→Spades × ranks 2..14 and drawn by ``pop()`` from the
END (so the first 8-card hand is A♠ K♠ … 7♠); play scores through the
``calculate_score`` pipeline (ops.scoring.score_sim); reward = score/100 with
+100 for beating the 300-chip blind (which zeroes hands_left); discard costs
reward −1; the hand refills to 8 from the deck top after every action.

This is the engine that must replay ``balatro_gym/balatro_trajectories.json``
bit-exactly (BASELINE config 4). It is a fixed-shape pytree + pure step —
``vmap``/``lax.scan`` over it directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from balatro_gym_tpu.core import cards as C
from balatro_gym_tpu.ops.scoring import score_sim

_I64 = jax.dtypes.canonicalize_dtype(jnp.int64)  # i64 under x64, i32 in production (no dtype warnings)

HAND_SIZE = 8
DECK_SIZE = 52
MAX_JOKERS = 5

_F = jax.dtypes.canonicalize_dtype(jnp.float64)  # no f64 warnings under f32


@struct.dataclass
class SimEnvState:
    deck_n: jnp.ndarray      # i32 cards remaining in deck
    hand_rank: jnp.ndarray   # [8] i32
    hand_suit: jnp.ndarray   # [8] i32
    hand_enh: jnp.ndarray    # [8] i32
    hand_n: jnp.ndarray      # i32
    money: jnp.ndarray       # i32
    ante: jnp.ndarray        # i32
    hands_left: jnp.ndarray  # i32
    discards_left: jnp.ndarray  # i32
    score: jnp.ndarray       # i64
    blind_requirement: jnp.ndarray  # i64
    jokers: jnp.ndarray      # [5] i32 joker ids (0 = empty)
    key: jnp.ndarray         # PRNG key
    done: jnp.ndarray        # bool


def _fixture_deck():
    """Deck order of GameState.create_standard_deck (balatro_sim_test.py:63-70):
    suits Hearts, Diamonds, Clubs, Spades; ranks 2..14 within each."""
    suit_order = [C.Suit.HEARTS, C.Suit.DIAMONDS, C.Suit.CLUBS, C.Suit.SPADES]
    ranks = np.concatenate([np.arange(2, 15) for _ in suit_order]).astype(np.int32)
    suits = np.concatenate([np.full(13, int(s)) for s in suit_order]).astype(np.int32)
    return jnp.asarray(ranks), jnp.asarray(suits)


# The fixture deck is immutable (the sim engine never enhances or destroys
# deck cards), so it lives as a trace constant instead of per-env state —
# this removes three [52] channels from the carried pytree, which profiling
# showed dominated the vectorized step's memory traffic.
DECK_RANK, DECK_SUIT = _fixture_deck()


def reset(key, jokers=None, blind_requirement=300, money=4):
    """Fresh single-blind state with the fixture's deterministic deck."""
    jok = jnp.zeros(MAX_JOKERS, jnp.int32) if jokers is None else jnp.asarray(jokers, jnp.int32)
    st = SimEnvState(
        deck_n=jnp.int32(DECK_SIZE),
        hand_rank=jnp.zeros(HAND_SIZE, jnp.int32),
        hand_suit=jnp.zeros(HAND_SIZE, jnp.int32),
        hand_enh=jnp.zeros(HAND_SIZE, jnp.int32),
        hand_n=jnp.int32(0),
        money=jnp.int32(money), ante=jnp.int32(1),
        hands_left=jnp.int32(4), discards_left=jnp.int32(3),
        score=jnp.asarray(0, _I64), blind_requirement=jnp.asarray(blind_requirement, _I64),
        jokers=jok, key=key, done=jnp.zeros((), bool),
    )
    return _refill(st)


def _refill(st: SimEnvState) -> SimEnvState:
    """Draw from the deck top (pop from end) until the hand holds 8 cards."""
    slots = jnp.arange(HAND_SIZE, dtype=jnp.int32)
    n_draw = jnp.minimum(HAND_SIZE - st.hand_n, st.deck_n)
    is_new = (slots >= st.hand_n) & (slots < st.hand_n + n_draw)
    src = jnp.clip(st.deck_n - 1 - (slots - st.hand_n), 0, DECK_SIZE - 1)
    return st.replace(
        hand_rank=jnp.where(is_new, DECK_RANK[src], st.hand_rank),
        hand_suit=jnp.where(is_new, DECK_SUIT[src], st.hand_suit),
        hand_enh=jnp.where(is_new, 0, st.hand_enh),
        hand_n=st.hand_n + n_draw,
        deck_n=st.deck_n - n_draw,
    )


def _remove_selected(st: SimEnvState, select):
    """Stable compaction: kept cards keep order, selected slots vacated."""
    slots = jnp.arange(HAND_SIZE, dtype=jnp.int32)
    kept = (slots < st.hand_n) & ~select
    # Stable compaction without a sort: kept card i moves to position
    # (#kept before i); scatter with drop-mode for removed slots.
    dest = jnp.where(kept, jnp.cumsum(kept.astype(jnp.int32)) - 1, HAND_SIZE)
    new_n = jnp.sum(kept).astype(jnp.int32)

    def compact(a):
        return jnp.zeros_like(a).at[dest].set(a, mode="drop")

    return st.replace(
        hand_rank=compact(st.hand_rank),
        hand_suit=compact(st.hand_suit),
        hand_enh=compact(st.hand_enh),
        hand_n=new_n,
    )


def step(st: SimEnvState, select, is_discard):
    """One action. select: [8] bool card mask; is_discard: bool.

    Returns (next_state, reward f, done bool). Mirrors execute_action
    (balatro_sim_test.py:390-441).
    """
    select = select & (jnp.arange(HAND_SIZE) < st.hand_n)
    key, sub = jax.random.split(st.key)

    # --- play branch (always computed; selected at the end) ---
    base_value = ((st.hand_rank[:, None] == jnp.arange(15)).astype(jnp.float32)
                  @ C.RANK_CHIPS.astype(jnp.float32)).astype(jnp.int32)
    delta, money_d, _ht, _smask = score_sim(
        st.hand_rank, st.hand_suit, select, st.hand_enh,
        jnp.zeros(HAND_SIZE, jnp.int32), jnp.zeros(HAND_SIZE, jnp.int32),
        base_value, st.jokers, st.hands_left, st.discards_left,
        jnp.int32(0), sub,  # purchased-cards count (none in the fixture loop)
    )
    new_score = st.score + delta
    beat = new_score >= st.blind_requirement
    play_reward = delta.astype(_F) / 100.0 + jnp.where(beat, 100.0, 0.0)
    play_hands_left = jnp.where(beat, 0, st.hands_left - 1)

    # --- select between play and discard ---
    reward = jnp.where(is_discard, -1.0, play_reward)
    st = st.replace(
        score=jnp.where(is_discard, st.score, new_score),
        money=jnp.where(is_discard, st.money, st.money + money_d),
        hands_left=jnp.where(is_discard, st.hands_left, play_hands_left),
        discards_left=jnp.where(is_discard, st.discards_left - 1, st.discards_left),
        key=key,
    )
    st = _refill(_remove_selected(st, select))
    done = st.hands_left <= 0
    return st.replace(done=done), reward, done


def action_mask(st: SimEnvState):
    """[10] mask: actions 0-4 play first k+1 cards, 5-9 discard first k+1.
    Mirrors get_available_actions (balatro_sim_test.py:361-388): prefixes of
    length 1..min(5, hand_n); discards also need discards_left > 0."""
    k = jnp.arange(5) + 1
    can_size = k <= jnp.minimum(st.hand_n, 5)
    play = can_size & (st.hand_n >= 1)
    disc = play & (st.discards_left > 0)
    return jnp.concatenate([play, disc]) & ~st.done


def decode_action(action):
    """action int 0..9 -> (select [8] bool, is_discard bool)."""
    is_discard = action >= 5
    k = jnp.where(is_discard, action - 5, action) + 1
    select = jnp.arange(HAND_SIZE) < k
    return select, is_discard


def step_action(st: SimEnvState, action):
    sel, isd = decode_action(action)
    return step(st, sel, isd)


def step_autoreset(st: SimEnvState, action):
    """step_action(), then re-deal in place when the blind ends — the
    vectorized rollout primitive (done => fresh fixture deck, same jokers)."""
    st2, reward, done = step_action(st, action)
    fresh = reset(st2.key, jokers=st2.jokers)
    st3 = jax.tree.map(lambda f, s: jnp.where(done, f, s), fresh, st2)
    return st3, reward, done


OBS_DIM = 8 * 17 + MAX_JOKERS + 6


def observe(st: SimEnvState):
    """Flat f32 policy observation (single env; vmap outside).

    Layout: per hand slot rank one-hot[13] + suit one-hot[4] (zero when
    empty), joker ids/150, then scalars [hands_left/4, discards_left/3,
    money/20, score/blind, blind/1000, deck_n/52].
    """
    slot = jnp.arange(HAND_SIZE)
    valid = slot < st.hand_n
    rank_oh = (st.hand_rank[:, None] == jnp.arange(2, 15)) & valid[:, None]
    suit_oh = (st.hand_suit[:, None] == jnp.arange(4)) & valid[:, None]
    cards = jnp.concatenate([rank_oh, suit_oh], axis=-1).reshape(-1)
    scalars = jnp.stack([
        st.hands_left / 4.0, st.discards_left / 3.0, st.money / 20.0,
        st.score.astype(jnp.float32) / jnp.maximum(st.blind_requirement, 1).astype(jnp.float32),
        st.blind_requirement.astype(jnp.float32) / 1000.0, st.deck_n / 52.0,
    ]).astype(jnp.float32)
    return jnp.concatenate([cards.astype(jnp.float32),
                            st.jokers.astype(jnp.float32) / 150.0, scalars])


def random_legal_action(st: SimEnvState, key):
    """Uniform draw over the legal [10] action mask."""
    mask = action_mask(st)
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits)


def rollout_random(key, n_envs: int, n_steps: int, jokers=None):
    """Random-policy vmapped rollout with auto-reset, fully on device.

    Returns (final_states, total_reward f64, episodes_done i32). One compiled
    lax.scan; throughput = n_envs * n_steps / wall.
    """
    keys = jax.random.split(key, n_envs)
    if jokers is not None:
        jokers = jnp.broadcast_to(jnp.asarray(jokers, jnp.int32), (n_envs, MAX_JOKERS))
        states = jax.vmap(reset)(keys, jokers)
    else:
        states = jax.vmap(reset)(keys)

    def one(st, k):
        return step_autoreset(st, random_legal_action(st, k))

    def body(carry, k):
        sts, tot, eps = carry
        ks = jax.random.split(k, n_envs)
        sts, rew, done = jax.vmap(one)(sts, ks)
        return (sts, tot + jnp.sum(rew).astype(_F),
                eps + jnp.sum(done, dtype=jnp.int32)), None

    (states, total, eps), _ = jax.lax.scan(
        body, (states, jnp.zeros((), _F), jnp.int32(0)),
        jax.random.split(jax.random.fold_in(key, 1), n_steps))
    return states, total, eps
