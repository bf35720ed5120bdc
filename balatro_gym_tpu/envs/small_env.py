"""Small single-blind env — the legacy 10-action contract, TPU-native.

Rebuild of ``BalatroSmallEnv`` (reference: balatro_gym/balatro_small_env.py:
8-120) on the CURRENT BalatroGame mechanics (the reference version targets a
deleted API and crashes — SURVEY §2.8). Contract kept: ``Discrete(10)``
(0 play, 1 discard, 2-9 highlight hand position), config
``chip_threshold`` / ``reward_dense`` (balatro_small_env.py:18), obs dict
{deck{cards, cards_played}, hand, highlighted, round_score, round_hands,
round_discards}.

Game mechanics per balatro_gym/balatro_game.py:95-169: unshuffled standard
deck, hand = lowest 8 "available" deck indices, ``play_hand`` scores
``chips*mult`` of the classified hand (levels only — card chips do NOT count
in this engine, :149-153), removes played cards from the hand and refills
ascending. Dense reward = per-play score; beating the threshold pays
``chip_threshold``; sparse mode pays only the win.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from balatro_gym_tpu.core import cards as C
from balatro_gym_tpu.core.constants import BASE_HAND_CHIPS, BASE_HAND_MULT
from balatro_gym_tpu.ops.hand_eval import classify_env

_I64 = jax.dtypes.canonicalize_dtype(jnp.int64)  # i64 under x64, i32 in production (no dtype warnings)

HAND = 8
DECK = 52
MAX_HL = 5
N_ACTIONS = 10


@struct.dataclass
class SmallEnvState:
    deck_rank: jnp.ndarray   # [52] i32 (static standard deck)
    deck_suit: jnp.ndarray   # [52]
    played: jnp.ndarray      # [52] bool — deck cards that have been played
    hand_idx: jnp.ndarray    # [8] i32 deck indices, -1 empty
    hand_n: jnp.ndarray
    hl: jnp.ndarray          # [5] i32 highlighted hand positions, -1 empty
    hl_n: jnp.ndarray
    round_score: jnp.ndarray  # i64
    hands_left: jnp.ndarray
    discards_left: jnp.ndarray
    done: jnp.ndarray


def reset(chip_threshold: int = 500) -> SmallEnvState:
    ranks, suits = C.standard_deck_arrays()
    st = SmallEnvState(
        deck_rank=jnp.asarray(ranks, jnp.int32),
        deck_suit=jnp.asarray(suits, jnp.int32),
        played=jnp.zeros(DECK, bool),
        hand_idx=jnp.full(HAND, -1, jnp.int32), hand_n=jnp.int32(0),
        hl=jnp.full(MAX_HL, -1, jnp.int32), hl_n=jnp.int32(0),
        round_score=jnp.asarray(0, _I64),
        hands_left=jnp.int32(4), discards_left=jnp.int32(3),
        done=jnp.zeros((), bool),
    )
    return _draw(st)


def _in_hand(st):
    # One-hot any-match, NOT a bool scatter-set (XLA:TPU silently drops dynamic-index BOOL scatter updates in vmapped programs).
    return jnp.any((jnp.arange(DECK)[:, None] == st.hand_idx[None, :])
                   & (st.hand_idx >= 0)[None, :], axis=1)


def _draw(st: SmallEnvState) -> SmallEnvState:
    """Fill ascending from 'available' (not in hand) — balatro_game.py:95-109.
    Played cards remain available (the reference's draw quirk)."""
    avail = ~_in_hand(st)
    need = jnp.clip(HAND - st.hand_n, 0, HAND)
    cum = jnp.cumsum(avail.astype(jnp.int32))
    chosen = avail & (cum <= need)
    pos = jnp.where(chosen, st.hand_n + cum - 1, HAND)
    hand_idx = st.hand_idx.at[pos].set(jnp.arange(DECK, dtype=jnp.int32), mode="drop")
    return st.replace(hand_idx=hand_idx,
                      hand_n=st.hand_n + jnp.sum(chosen).astype(jnp.int32))


def _remove_positions(st: SmallEnvState, remove8) -> SmallEnvState:
    slots = jnp.arange(HAND)
    keep = (slots < st.hand_n) & ~remove8
    order = jnp.argsort(~keep, stable=True)
    new_n = jnp.sum(keep).astype(jnp.int32)
    return st.replace(
        hand_idx=jnp.where(slots < new_n, st.hand_idx[order], -1),
        hand_n=new_n,
        hl=jnp.full(MAX_HL, -1, jnp.int32), hl_n=jnp.int32(0),
    )


def _hl_mask(st):
    """[8] bool of highlighted hand positions."""
    return jnp.any((jnp.arange(HAND)[:, None] == st.hl[None, :])
                   & (st.hl >= 0)[None, :], axis=1)


def step(st: SmallEnvState, action, chip_threshold: int = 500,
         reward_dense: bool = True):
    """One step. Returns (state, reward f32, done)."""
    action = jnp.asarray(action, jnp.int32)
    hlm = _hl_mask(st) & (jnp.arange(HAND) < st.hand_n)

    # --- play (score = chips*mult of classified hand, balatro_game:149-153)
    idx = jnp.where(st.hand_idx >= 0, st.hand_idx, 0)
    ranks = st.deck_rank[idx]
    suits = st.deck_suit[idx]
    ht = classify_env(ranks, suits, hlm)
    score = (BASE_HAND_CHIPS[ht] * BASE_HAND_MULT[ht]).astype(_I64)
    played_mark = jnp.any(
        (jnp.arange(DECK)[:, None] == jnp.where(hlm, idx, -1)[None, :]),
        axis=1)
    played_st = _draw(_remove_positions(
        st.replace(round_score=st.round_score + score,
                   hands_left=st.hands_left - 1,
                   played=st.played | played_mark), hlm))

    # --- discard ---
    disc_st = _draw(_remove_positions(
        st.replace(discards_left=st.discards_left - 1), hlm))

    # --- highlight position (append if < 5 highlighted) ---
    pos = jnp.clip(action - 2, 0, HAND - 1)
    already = _hl_mask(st)[pos]
    can_hl = (st.hl_n < MAX_HL) & (pos < st.hand_n) & ~already
    hl_st = st.replace(
        hl=jnp.where(can_hl, st.hl.at[jnp.clip(st.hl_n, 0, MAX_HL - 1)].set(pos), st.hl),
        hl_n=st.hl_n + jnp.where(can_hl, 1, 0))

    is_play = action == 0
    is_disc = action == 1

    def pick(a, b, c):
        return jnp.where(is_play, a, jnp.where(is_disc, b, c))

    nxt = jax.tree.map(pick, played_st, disc_st, hl_st)
    won = nxt.round_score >= chip_threshold
    lost = is_play & (nxt.hands_left <= 0) & ~won
    reward = jnp.where(is_play & reward_dense, score.astype(jnp.float32), 0.0)
    reward = jnp.where(won, jnp.float32(chip_threshold), reward)
    done = won | lost | st.done
    nxt = jax.tree.map(lambda a, b: jnp.where(st.done, a, b), st, nxt)
    return nxt.replace(done=done), reward, done


def action_mask(st: SmallEnvState):
    """Legal actions (balatro_small_env.py:106-117)."""
    ids = jnp.arange(N_ACTIONS)
    any_hl = st.hl_n > 0
    m = jnp.zeros(N_ACTIONS, bool)
    m = m.at[0].set(any_hl & (st.hands_left > 0))
    m = m.at[1].set(any_hl & (st.discards_left > 0))
    hl8 = _hl_mask(st)
    sel_ok = (ids >= 2) & ((ids - 2) < st.hand_n) & (st.hl_n < MAX_HL)
    sel_ok = sel_ok & ~hl8[jnp.clip(ids - 2, 0, HAND - 1)]
    return (m | sel_ok) & ~st.done


def observe(st: SmallEnvState):
    """Reference obs schema (balatro_small_env.py:77-99)."""
    return {
        "deck": {
            "cards": C.encode_rs(st.deck_rank, st.deck_suit) + 1,
            "cards_played": st.played.astype(jnp.int32),
        },
        "hand": jnp.where(st.hand_idx >= 0, st.hand_idx, 0),
        "highlighted": jnp.where(st.hl >= 0, st.hl, 0),
        "round_score": st.round_score,
        "round_hands": st.hands_left,
        "round_discards": st.discards_left,
        "action_mask": action_mask(st).astype(jnp.int32),
    }


class BalatroSmallGymEnv:
    """Gym shell with the BalatroSmallEnv contract + action_masks()."""

    metadata = {"render_modes": ["ansi"], "render_fps": 4}

    def __init__(self, render_mode=None, chip_threshold: int = 500,
                 reward_dense: bool = True):
        self.render_mode = render_mode
        self.chip_threshold = chip_threshold
        self.reward_dense = reward_dense
        self._st = None
        self._jstep = jax.jit(step, static_argnums=(2, 3))
        self._jobs = jax.jit(observe)
        try:
            from gymnasium import spaces

            self.action_space = spaces.Discrete(N_ACTIONS)
        except ImportError:  # pragma: no cover
            self.action_space = None

    def reset(self, seed=None, options=None):
        self._st = reset(self.chip_threshold)
        return self._obs(), {}

    def step(self, action):
        mask = self.action_masks()
        if not mask[int(action)]:
            raise RuntimeError("Environment tried to take an invalid action.")
        self._st, r, done = self._jstep(self._st, jnp.int32(int(action)),
                                        self.chip_threshold, self.reward_dense)
        return self._obs(), float(r), bool(done), False, {}

    def _obs(self):
        o = jax.device_get(self._jobs(self._st))
        flat = {k: np.asarray(v) for k, v in o.items() if k != "deck"}
        flat["deck"] = {k: np.asarray(v) for k, v in o["deck"].items()}
        return flat

    def action_masks(self):
        return np.asarray(jax.device_get(action_mask(self._st))).astype(bool)

    def render(self):
        if self.render_mode != "ansi":
            return None
        st = self._st
        idx = np.asarray(st.hand_idx)
        hand = " ".join(
            C.card_str(int(st.deck_rank[idx[i]]), int(st.deck_suit[idx[i]]))
            for i in range(int(st.hand_n)))
        return (f"Score: {int(st.round_score)}/{self.chip_threshold}\n"
                f"Hand: {hand}\nHighlighted: {np.asarray(st.hl).tolist()}\n")

    def close(self):
        pass
