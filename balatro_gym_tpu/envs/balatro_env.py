"""Gym-compatible shell over the flagship full-game env.

Drop-in for the reference's ``BalatroEnv`` contract
(balatro_gym/balatro_env_2.py:354-503): ``Discrete(60)`` actions, the same
Dict observation keys and numpy dtypes (:1488-1531), ``save_state`` /
``load_state`` checkpointing (:1575-1615), ASCII render (:1617-1724), and a
``BalatroEnvValidator`` with determinism + action-mask checks (:1733-1796).

The shell is a thin host loop; all game logic is the jitted
``engine.full_env.step`` — one device call per step.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core import cards as C
from balatro_gym_tpu.core.constants import Action, Phase
from balatro_gym_tpu.engine import full_env as fe

_OBS_DTYPES = {
    "hand": np.int8,
    "hand_size": np.int8,
    "deck_size": np.int8,
    "selected_cards": np.int64,
    "chips_scored": np.int64,
    "round_chips_scored": np.int32,
    "progress_ratio": np.float32,
    "mult": np.int32,
    "chips_needed": np.int32,
    "money": np.int32,
    "ante": np.int16,
    "round": np.int8,
    "hands_left": np.int8,
    "discards_left": np.int8,
    "joker_count": np.int8,
    "joker_ids": np.int16,
    "joker_slots": np.int8,
    "consumable_count": np.int8,
    "consumables": np.int16,
    "consumable_slots": np.int8,
    "shop_items": np.int16,
    "shop_costs": np.int16,
    "shop_rerolls": np.int16,
    "hand_levels": np.int8,
    "phase": np.int8,
    "action_mask": np.int8,
    "hands_played": np.int32,
    "best_hand_this_ante": np.int32,
    "boss_blind_active": np.int8,
    "boss_blind_type": np.int8,
    "face_down_cards": np.int64,
}


class BalatroGymEnv:
    """Single-env host shell with the reference BalatroEnv contract."""

    metadata = {"render_modes": ["human"]}

    def __init__(self, *, seed: int = 0, render_mode: str | None = None):
        self.render_mode = render_mode
        self._seed = seed
        self._st = None
        self._jstep = jax.jit(fe.step)
        self._jreset = jax.jit(fe.reset)
        self._jobs = jax.jit(fe.observe)
        try:
            from gymnasium import spaces

            self.action_space = spaces.Discrete(Action.ACTION_SPACE_SIZE)
        except ImportError:  # pragma: no cover
            self.action_space = None

    # ---------------------------- Gym interface ----------------------------

    def reset(self, *, seed: int | None = None, options=None):
        if seed is not None:
            self._seed = seed
        self._st = self._jreset(jax.random.key(self._seed))
        return self._obs(), {}

    def step(self, action: int):
        st, reward, done = self._jstep(self._st, jnp.int32(int(action)))
        self._st = st
        return self._obs(), float(reward), bool(done), False, {}

    def _obs(self) -> Dict[str, Any]:
        raw = jax.device_get(self._jobs(self._st))
        return {k: np.asarray(v).astype(_OBS_DTYPES[k]) for k, v in raw.items()}

    # --------------------------- checkpointing ----------------------------

    def save_state(self):
        """Full checkpoint = the state pytree (covers RNG streams, hand
        levels, boss state — everything; cf. balatro_env_2.py:1575-1593).
        JAX arrays are immutable, so the pytree itself IS the snapshot; for
        on-disk serialization use orbax on this pytree."""
        return self._st

    def load_state(self, saved) -> None:
        self._st = saved

    # ------------------------------- render --------------------------------

    def render(self):
        if self.render_mode != "human":
            return
        st = self._st
        print("=" * 50)
        print(f"Ante {int(st.ante)} - Round {int(st.round)} - "
              f"Phase: {Phase(int(st.phase)).name}")
        if bool(st.boss_active):
            from balatro_gym_tpu.ops.boss import BOSS_NAMES

            print(f"BOSS BLIND: {BOSS_NAMES[int(st.boss_id)]}")
        print(f"Score: {int(st.round_chips_scored)}/{int(st.chips_needed)}  "
              f"Money: ${int(st.money)}  Hands: {int(st.hands_left)}  "
              f"Discards: {int(st.discards_left)}")
        glyph = {1: "+", 2: "*", 3: "W", 4: "G", 5: "S", 6: "O", 7: "$", 8: "L"}
        out = []
        idx = np.asarray(st.hand_idx)
        for i in range(min(8, int(st.hand_n))):
            slot = int(idx[i])
            s = C.card_str(int(st.card_rank[slot]), int(st.card_suit[slot]))
            e = glyph.get(int(st.card_enh[slot]), "")
            mark = "[*]" if bool(st.selected[i]) else ""
            out.append(f"{i}:{s}{e}{mark}")
        print("Hand:", " ".join(out))

    def close(self):
        pass


def make_balatro_env(**kwargs) -> BalatroGymEnv:
    return BalatroGymEnv(**kwargs)


class BalatroEnvValidator:
    """Determinism + action-mask validation, mirroring
    ``BalatroEnvValidator`` (balatro_env_2.py:1733-1796)."""

    @staticmethod
    def validate_determinism(seed: int = 42, steps: int = 100) -> bool:
        e1, e2 = BalatroGymEnv(seed=seed), BalatroGymEnv(seed=seed)
        o1, _ = e1.reset()
        o2, _ = e2.reset()
        rng = np.random.default_rng(0)
        for _ in range(steps):
            legal = np.flatnonzero(o1["action_mask"])
            if len(legal) == 0:
                break
            a = int(rng.choice(legal))
            o1, r1, d1, _, _ = e1.step(a)
            o2, r2, d2, _, _ = e2.step(a)
            if r1 != r2 or d1 != d2:
                return False
            for k in o1:
                if not np.array_equal(o1[k], o2[k]):
                    return False
            if d1:
                o1, _ = e1.reset()
                o2, _ = e2.reset()
        return True

    @staticmethod
    def validate_action_masking(seed: int = 7, steps: int = 50) -> bool:
        """Masked actions must yield exactly -1 and leave state unchanged;
        unmasked actions must not yield the invalid-action -1 state-freeze."""
        env = BalatroGymEnv(seed=seed)
        obs, _ = env.reset()
        rng = np.random.default_rng(1)
        for _ in range(steps):
            mask = obs["action_mask"].astype(bool)
            illegal = np.flatnonzero(~mask)
            if len(illegal):
                saved = env.save_state()
                _, r, done, _, _ = env.step(int(rng.choice(illegal)))
                if r != -1.0 or done:
                    return False
                env.load_state(saved)
            legal = np.flatnonzero(mask)
            if len(legal) == 0:
                break
            obs, r, done, _, _ = env.step(int(rng.choice(legal)))
            if done:
                obs, _ = env.reset()
        return True
