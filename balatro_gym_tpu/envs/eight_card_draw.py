"""EightCardDraw — the minimal end-to-end env, TPU-native.

Rebuild of ``EightCardDrawEnv`` (reference: balatro_gym/env.py:108-246):
a two-phase single-hand episode — phase 0 submits an 8-bit discard mask
(actions 0-255), phase 1 picks exactly 5 of 8 cards (actions 256-311) and
scores them. Observation = {cards 8x52 one-hot, phase, action_mask(312)}.

Scoring: the reference's treys path is broken (it references the deleted
``Card.Ranks`` / ``BalatroGame._evaluate_hand`` API, env.py:85-93) and falls
back to a hash. The *intended* scorer — confirmed by the golden unit-test
values (tests/chips_test.py:3-25: royal flush (100+51)*8=1208, wheel straight
(30+25)*4=220, high-card A (5+11)*1=16) — is
``(base_chips + sum(card chips)) * base_mult / 1000``. We implement that
intent with the real hand classifier; the hash fallback is junk, not spec.

Everything is a fixed-shape pytree + pure functions: ``reset``/``step`` are
jit/vmap-friendly, ``step_autoreset`` re-deals terminated episodes in place so
``vmap`` + ``lax.scan`` rollouts never leave the device.

Card integer codec: 0-51 with rank = code % 13 + 2, suit = code // 13 —
matching env.py:85-88 / the sim packing (cards are dealt as raw ints in the
reference, env.py:155-158).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from balatro_gym_tpu.core.actions import (
    ACTION_SPACE_SIZE,
    DISCARD_MASKS,
    NUM_DISCARD_ACTIONS,
    SELECT_MASKS,
    SELECT_OFFSET,
)
from balatro_gym_tpu.core.cards import RANK_CHIPS
from balatro_gym_tpu.core.constants import BASE_HAND_CHIPS, BASE_HAND_MULT
from balatro_gym_tpu.ops.hand_eval import classify_env

HAND = 8
DECK = 52


@struct.dataclass
class ECDState:
    deck: jnp.ndarray      # [52] i32 shuffled card codes; positions 8.. are the draw pile
    hand: jnp.ndarray      # [8] i32 card codes
    phase: jnp.ndarray     # i32: 0 = discard, 1 = select-five
    terminated: jnp.ndarray  # bool
    key: jnp.ndarray       # PRNG key for the *next* deal


def reset(key) -> ECDState:
    """Deal a fresh 8-card hand from a shuffled deck (env.py:155-158)."""
    key, sub = jax.random.split(key)
    deck = jax.random.permutation(sub, jnp.arange(DECK, dtype=jnp.int32))
    return ECDState(
        deck=deck,
        hand=deck[:HAND],
        phase=jnp.int32(0),
        terminated=jnp.zeros((), bool),
        key=key,
    )


def score_five(hand, keep):
    """Chips/1000 for the kept cards. hand: [8] codes, keep: [8] bool (5 set)."""
    ranks = hand % 13 + 2
    suits = hand // 13
    ht = classify_env(ranks, suits, keep)
    chips = BASE_HAND_CHIPS[ht] + jnp.sum(jnp.where(keep, RANK_CHIPS[ranks], 0))
    return chips.astype(jnp.float32) * BASE_HAND_MULT[ht].astype(jnp.float32) / 1000.0


def step(st: ECDState, action):
    """One env step. Invalid-phase actions are clamped into the legal range
    (the host Gym shell raises instead, mirroring mask semantics)."""
    # --- phase 0: discard. Replacement for the i-th discarded card is
    # deck[8 + (#discards before i)] (env.py:199-201: hand[discards] = deck[8:8+n]).
    a_disc = jnp.clip(action, 0, NUM_DISCARD_ACTIONS - 1)
    dmask = DISCARD_MASKS[a_disc]
    before = jnp.cumsum(dmask) - dmask
    src = 8 + before
    hand_after_discard = jnp.where(dmask, st.deck[src], st.hand)

    # --- phase 1: select-five and score.
    a_sel = jnp.clip(action - SELECT_OFFSET, 0, SELECT_MASKS.shape[0] - 1)
    keep = SELECT_MASKS[a_sel]
    reward_sel = score_five(st.hand, keep)

    in_discard = st.phase == 0
    new_st = st.replace(
        hand=jnp.where(in_discard, hand_after_discard, st.hand),
        phase=jnp.where(in_discard, 1, st.phase),
        terminated=jnp.where(in_discard, st.terminated, True),
    )
    reward = jnp.where(in_discard, 0.0, reward_sel)
    return new_st, reward, new_st.terminated


def step_autoreset(st: ECDState, action):
    """step(), then re-deal in place if the episode ended — the vectorized
    rollout primitive. Returns (state, obs_of_next_state, reward, done)."""
    st2, reward, done = step(st, action)
    fresh = reset(st2.key)
    st3 = jax.tree.map(lambda a, b: jnp.where(done, a, b), fresh, st2)
    return st3, reward, done


def observe(st: ECDState):
    """The reference's Dict observation as device arrays (env.py:181-186)."""
    cards = (st.hand[:, None] == jnp.arange(DECK, dtype=jnp.int32)).astype(jnp.int8)
    return {
        "cards": cards,
        "phase": st.phase.astype(jnp.int8),
        "action_mask": action_mask(st),
    }


def action_mask(st: ECDState):
    """[312] legal-action mask (env.py:165-171)."""
    ids = jnp.arange(ACTION_SPACE_SIZE)
    discard_legal = ids < NUM_DISCARD_ACTIONS
    select_legal = ids >= SELECT_OFFSET
    return jnp.where(st.phase == 0, discard_legal, select_legal) & ~st.terminated


def random_legal_action(st: ECDState, key):
    """Uniform legal action — used by throughput benchmarks."""
    u = jax.random.randint(key, (), 0, NUM_DISCARD_ACTIONS)
    s = jax.random.randint(key, (), SELECT_OFFSET, ACTION_SPACE_SIZE)
    return jnp.where(st.phase == 0, u, s)


def rollout(key, n_envs: int, n_steps: int):
    """Random-policy vmapped rollout entirely on device.

    Returns (final_states, total_reward, episodes_done). One compiled
    ``lax.scan``; throughput = n_envs * n_steps / wall_time.
    """
    keys = jax.random.split(key, n_envs)
    states = jax.vmap(reset)(keys)

    def body(carry, k):
        sts, tot, eps = carry
        ks = jax.random.split(k, n_envs)
        actions = jax.vmap(random_legal_action)(sts, ks)
        sts, rew, done = jax.vmap(step_autoreset)(sts, actions)
        return (sts, tot + jnp.sum(rew, dtype=jnp.float32),
                eps + jnp.sum(done, dtype=jnp.int32)), None

    (states, total, eps), _ = jax.lax.scan(
        body, (states, jnp.float32(0), jnp.int32(0)),
        jax.random.split(jax.random.fold_in(key, 1), n_steps))
    return states, total, eps


# ---------------------------------------------------------------------------
# Gymnasium-compatible host shell
# ---------------------------------------------------------------------------


class EightCardDrawGymEnv:
    """Drop-in single-env shell with the reference's Gym contract.

    Implemented without a hard gymnasium dependency (duck-typed spaces when
    gymnasium is absent); the device step underneath is the jitted kernel.
    """

    metadata = {"render_modes": ["human"]}

    def __init__(self, *, render_mode: str | None = None, seed: int = 0):
        self.render_mode = render_mode
        self._key = jax.random.key(seed)
        self._st = None
        self._step = jax.jit(step)
        self._reset = jax.jit(reset)
        self._observe = jax.jit(observe)
        self._mask = jax.jit(action_mask)
        try:
            from gymnasium import spaces

            self.action_space = spaces.Discrete(ACTION_SPACE_SIZE)
            self.observation_space = spaces.Dict({
                "cards": spaces.MultiBinary((HAND, DECK)),
                "phase": spaces.Discrete(2),
                "action_mask": spaces.MultiBinary(ACTION_SPACE_SIZE),
            })
        except ImportError:  # pragma: no cover
            self.action_space = self.observation_space = None

    def _obs(self):
        import numpy as np

        o = jax.device_get(self._observe(self._st))
        return {k: np.asarray(v) for k, v in o.items()}

    def reset(self, *, seed: int | None = None, options=None):
        if seed is not None:
            self._key = jax.random.key(seed)
        self._key, sub = jax.random.split(self._key)
        self._st = self._reset(sub)
        return self._obs(), {}

    def step(self, action: int):
        if self._st is None:
            raise RuntimeError("reset() must be called first")
        if bool(self._st.terminated):
            raise RuntimeError("`step()` called on terminated episode")
        import numpy as np

        if not bool(np.asarray(self._mask(self._st))[int(action)]):
            raise ValueError(f"illegal action {action} in phase {int(self._st.phase)}")
        self._st, reward, done = self._step(self._st, jnp.int32(int(action)))
        return self._obs(), float(reward), bool(done), False, {}

    def render(self):
        if self.render_mode != "human":
            return
        from balatro_gym_tpu.core.cards import card_str

        hand = [card_str(int(c) % 13 + 2, int(c) // 13) for c in self._st.hand]
        phase_name = "Discard" if int(self._st.phase) == 0 else "Select-5"
        print(f"[{phase_name}] Hand: {' '.join(hand)}")

    def close(self):
        pass


def make(id: str = "EightCardDraw-v0", **kwargs):
    if id != "EightCardDraw-v0":
        raise ValueError(f"Unknown env id: {id}")
    return EightCardDrawGymEnv(**kwargs)
