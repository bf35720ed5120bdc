"""User-facing facades mirroring the reference's ScoreEngine / BalatroSimulator.

These are thin host-side classes over the jitted kernels so users of the
reference API (reference: balatro_gym/scoring_engine.py:61-145 and
balatro_gym/balatro_sim.py:23-783) find the same entry points:

* ``ScoreEngine`` — per-hand-type levels, ``get_hand_chips_mult``,
  ``apply_planet``, ``hand_play_counts``, simple ``score_hand``.
* ``BalatroSimulator`` — ``evaluate_hand(cards)`` returning the matched-hand
  dict with scoring card sets + ``'top'``, and ``calculate_score(cards)``
  through the fixture scoring pipeline.

Cards are (rank, suit) int tuples in the canonical encoding (core.cards).
These facades are for interactive/host use; vectorized training uses the
pure-function engines directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core import cards as C
from balatro_gym_tpu.core.constants import (
    BASE_HAND_CHIPS,
    BASE_HAND_MULT,
    HandType,
    NUM_HAND_TYPES,
    PLANET_HAND,
    PLANET_NAMES,
    SIM_HAND_NAMES,
)
from balatro_gym_tpu.ops.scoring import score_sim


class ScoreEngine:
    """Hand levels + base values (scoring_engine.py:61-145 semantics)."""

    def __init__(self):
        self.hand_levels = {HandType(h): 1 for h in range(NUM_HAND_TYPES)}
        self.hand_play_counts = {HandType(h): 0 for h in range(NUM_HAND_TYPES)}

    def get_hand_level(self, hand_type: HandType) -> int:
        return self.hand_levels[HandType(hand_type)]

    def get_hand_chips_mult(self, hand_type: HandType) -> tuple[int, int]:
        """Level-adjusted (chips, mult): +10 chips/+1 mult per level above 1
        (scoring_engine.py:92-101)."""
        ht = HandType(hand_type)
        level = self.hand_levels[ht]
        return (int(BASE_HAND_CHIPS[ht]) + (level - 1) * 10,
                int(BASE_HAND_MULT[ht]) + (level - 1))

    def apply_planet(self, hand_type: HandType) -> None:
        # Clamped at 15 like the reference engine (scoring_engine.py:82-85).
        ht = HandType(hand_type)
        self.hand_levels[ht] = min(self.hand_levels[ht] + 1, 15)

    def apply_planet_by_name(self, planet: str) -> None:
        self.apply_planet(HandType(int(PLANET_HAND[PLANET_NAMES.index(planet)])))

    def score_hand(self, cards) -> int:
        """Simple (base + card chips) * mult at current level
        (scoring_engine.py:103-128)."""
        from balatro_gym_tpu.oracle.hand_oracle import classify_env_oracle

        ht = classify_env_oracle(list(cards))
        chips, mult = self.get_hand_chips_mult(ht)
        chips += sum(int(C.RANK_CHIPS[r]) for r, _ in cards)
        return chips * mult


class BalatroSimulator:
    """Host facade over the sim-path kernels (balatro_sim.py API surface)."""

    def __init__(self, jokers=()):
        self.engine = ScoreEngine()
        self.jokers = list(jokers)
        self._score = jax.jit(score_sim)

    # -- hand evaluation (balatro_sim.py:220-366) --

    def evaluate_hand(self, cards) -> dict:
        """All matched hands with their scoring-card index sets + 'top',
        including the combined entries (Full House/Two Pair/Straight Flush/
        Flush House/Flush Five) and the group CASCADE of the reference
        (balatro_sim.py:255-364: 5K→4K→3K→Pair; Full House also emits a
        Two Pair entry)."""
        from balatro_gym_tpu.oracle.hand_oracle import (
            evaluate_sim_oracle, _x_same, _flush, _straight)

        cards = list(cards)
        ff = any(j == 18 for j in self.jokers)       # Four Fingers
        sc = any(j == 69 for j in self.jokers)       # Shortcut
        top, top_set = evaluate_sim_oracle(cards, ff, sc)

        g5, g4, g3, g2 = (_x_same(k, cards) for k in (5, 4, 3, 2))
        fl = _flush(cards, ff)
        st_, _sk = _straight(cards, ff, sc)
        if st_ is not None:
            st_ = st_[: 4 if ff else 5]

        out: dict = {name: [] for name in SIM_HAND_NAMES}
        if g5 and fl is not None:
            out["Flush Five"] = [list(g) for g in g5]
        if g3 and g2 and fl is not None:
            out["Flush House"].append(list(g3[0]) + list(g2[0]))
        if g5:
            out["Five of a Kind"] = [list(g) for g in g5]
        if fl is not None and st_ is not None:
            out["Straight Flush"] = [
                list(fl) + [c for c in st_ if c not in fl]]
        if g4:
            out["Four of a Kind"] = [list(g) for g in g4]
        if g3 and g2:
            out["Full House"].append(list(g3[0]) + list(g2[0]))
        if fl is not None:
            out["Flush"].append(list(fl))
        if st_ is not None:
            out["Straight"].append(list(st_))
        if g3:
            out["Three of a Kind"] = [list(g) for g in g3]
        if len(g2) == 2 or (len(g3) == 1 and len(g2) == 1):
            second = g2[1] if len(g2) > 1 else g3[0]
            out["Two Pair"].append(list(g2[0]) + list(second))
        if g2:
            out["Pair"] = [list(g) for g in g2]
        out["High Card"] = [list(range(len(cards)))]

        # Cascade lower hands (balatro_sim.py:355-364).
        if out["Five of a Kind"]:
            out["Four of a Kind"] = [out["Five of a Kind"][0][:4]]
        if out["Four of a Kind"]:
            out["Three of a Kind"] = [out["Four of a Kind"][0][:3]]
        if out["Three of a Kind"]:
            out["Pair"] = [out["Three of a Kind"][0][:2]]

        out["top"] = SIM_HAND_NAMES[top]
        out["top_type"] = int(top)
        out["scoring_cards"] = sorted(top_set)
        return out

    # -- scoring (balatro_sim.py:402-548 pipeline) --

    def calculate_score(self, cards, enhancements=None, seed: int = 0):
        """Score the played cards; returns (score, state_delta dict)."""
        N = 8
        n = len(cards)
        ranks = np.zeros(N, np.int32)
        suits = np.zeros(N, np.int32)
        enh = np.zeros(N, np.int32)
        valid = np.zeros(N, bool)
        for i, (r, s) in enumerate(cards[:N]):
            ranks[i], suits[i], valid[i] = r, s, True
            if enhancements and i < len(enhancements):
                enh[i] = int(enhancements[i])
        jok = np.zeros(5, np.int32)
        for i, j in enumerate(self.jokers[:5]):
            jok[i] = j
        # NOTE: hand levels do NOT affect this pipeline — the reference's
        # calculate_score reads base values only (balatro_sim.py:431-436),
        # so apply_planet changes engine state but not sim scores.
        zeros = jnp.zeros(N, jnp.int32)
        base_value = jnp.asarray(
            [int(C.RANK_CHIPS[r]) for r in ranks], jnp.int32)
        score, money, ht, smask = self._score(
            jnp.asarray(ranks), jnp.asarray(suits), jnp.asarray(valid),
            jnp.asarray(enh), zeros, zeros, base_value, jnp.asarray(jok),
            jnp.int32(4), jnp.int32(3), jnp.int32(0),
            jax.random.key(seed))
        self.engine.hand_play_counts[HandType(int(ht))] += 1
        return int(score), {"money": int(money),
                            "hand_type": SIM_HAND_NAMES[int(ht)],
                            "scoring_cards": np.flatnonzero(np.asarray(smask)).tolist()}
