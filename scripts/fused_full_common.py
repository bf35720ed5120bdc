"""Shared fixtures for the fused full-env kernel validators.

State surgery + coverage-biased legal-action generation used by both
``validate_fused_full_cpu.py`` (rows harness, eager/compiled XLA) and
``validate_fused_full_tpu.py`` (the real ``pallas_call``), so CPU and TPU
validation exercise the same scenario battery. No jax.config here — each
validator owns its platform setup before importing this.
"""
import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.engine import consumable_logic as CL
from balatro_gym_tpu.ops import boss as BB
from balatro_gym_tpu.ops import fused_full_rollout as FF

B = FF.TILE

# Consumable ids covering every _consumable_branch sub-path.
CONS_IDS = [
    CL.MAGICIAN, CL.HIGH_PRIESTESS, CL.EMPEROR, CL.JUDGEMENT, CL.FOOL,
    CL.HERMIT, CL.TEMPERANCE, CL.HANGED_MAN, CL.STRENGTH, CL.DEATH,
    CL.STAR, CL.WHEEL, CL.AURA, CL.HIEROPHANT, CL.LOVERS, CL.CHARIOT,
    CL.JUSTICE, CL.DEVIL, CL.TOWER,
    CL.PLANET_BASE, CL.PLANET_BASE + 5, CL.PLANET_BASE + 11,
    CL.FAMILIAR, CL.GRIM, CL.INCANTATION, CL.WRAITH, CL.SIGIL, CL.OUIJA,
    CL.ECTOPLASM, CL.IMMOLATE, CL.ANKH, CL.HEX, CL.CRYPTID, CL.THE_SOUL,
    CL.BLACK_HOLE, CL.TALISMAN, CL.DEJA_VU, CL.TRANCE, CL.MEDIUM,
    CL.ENUMNAME_OFFSET + CL.TAROT_BASE + 3,  # Emperor-minted enum-name form
]

# Joker suites: every id the kernel's count vectors reference, in rotation.
JOKER_SETS = [
    (0, 0, 0, 0, 0),
    (1, 31, 34, 48, 72),       # bench set
    (6, 7, 131, 135, 0),       # hand-type jokers
    (18, 69, 16, 23, 108),     # Four Fingers/Shortcut/Half/Mystic/Acrobat
    (116, 118, 119, 2, 3),     # suit jokers
    (147, 140, 128, 122, 61),  # Triboulet/ShootMoon/SeeingDbl/Flower/Cavendish
    (62, 63, 64, 65, 93),      # flat-table ids
    (33, 37, 44, 115, 70),     # Misprint/etc + Smeared
]

BOSS_IDS = [BB.PSYCHIC, BB.EYE, BB.MOUTH, BB.VERDANT, BB.FLINT, BB.OXIDE,
            BB.ARM, BB.PLANT, BB.VIOLET, BB.PILLAR, BB.WHEEL, BB.HOUSE,
            BB.MARK, BB.FISH, BB.HOOK, BB.WALL, BB.WATER, BB.MANACLE,
            BB.NEEDLE, BB.TOOTH]

# Action-category weights for the coverage-biased legal policy.
WEIGHTS = np.ones(60, np.float64)
WEIGHTS[0] = 5.0                    # play
WEIGHTS[1] = 3.0                    # discard
WEIGHTS[10:15] = 8.0                # use consumable
WEIGHTS[20:30] = 3.0                # buy
WEIGHTS[30] = 3.0                   # reroll
WEIGHTS[32:37] = 3.0                # sell
WEIGHTS[45:48] = 2.0                # blinds
WEIGHTS[48] = 1.0                   # skip


def surgery(st, rng):
    """Diversify a post-prelude batch so fed actions exercise every branch:
    jokers, enhanced/sealed/edition cards, consumables, boss states, shop
    money, near-beat chip counts."""
    g = jax.device_get
    card_enh = g(st.card_enh).copy()
    card_ed = g(st.card_ed).copy()
    card_seal = g(st.card_seal).copy()
    jokers = g(st.jokers).copy()
    joker_n = g(st.joker_n).copy()
    cons = g(st.cons).copy()
    cons_n = g(st.cons_n).copy()
    cons_slots = g(st.cons_slots).copy()
    money = g(st.money).copy()
    rcs = g(st.round_chips_scored).copy()
    need = g(st.chips_needed).copy()
    boss_active = g(st.boss_active).copy()
    boss_id = g(st.boss_id).copy()
    bslots = g(st.boss_played_slots).copy()
    phase = g(st.phase)
    hand_levels = g(st.hand_levels).copy()

    env = np.arange(B)
    enh_vals = rng.integers(1, 9, (B, 64)).astype(np.int32)
    ed_vals = rng.integers(1, 5, (B, 64)).astype(np.int32)
    seal_vals = rng.integers(1, 5, (B, 64)).astype(np.int32)
    card_enh = np.where(rng.random((B, 64)) < 0.30, enh_vals, card_enh)
    card_ed = np.where(rng.random((B, 64)) < 0.15, ed_vals, card_ed)
    card_seal = np.where(rng.random((B, 64)) < 0.25, seal_vals, card_seal)

    sets = np.asarray(JOKER_SETS, np.int32)[env % len(JOKER_SETS)]
    jokers[:] = sets
    joker_n[:] = (sets > 0).sum(1).astype(joker_n.dtype)

    cids = np.asarray(CONS_IDS, np.int32)
    cons[:, 0] = cids[env % len(cids)]
    cons[:, 1] = cids[(env + 7) % len(cids)]
    cons_n[:] = 2
    cons_slots[:] = np.where(env % 3 == 0, 2, 4)  # some envs have free slots

    money[:] = np.where(env % 4 == 0, 3, 60)      # afford / can't-afford mix
    # a quarter of PLAY lanes sit just under the blind: beat-path coverage
    near = (env % 4 == 1) & (phase == 0)
    rcs = np.where(near, np.maximum(need - 40, 0), rcs)

    on = (env % 2 == 0) & (phase == 0)
    boss_active = boss_active | on
    bids = np.asarray(BOSS_IDS, np.int32)[env % len(BOSS_IDS)]
    boss_id = np.where(on, bids, boss_id)
    bslots = bslots | (rng.random((B, 64)) < 0.2)  # Pillar marks

    hand_levels[env % 5 == 0] += 2

    return st.replace(
        card_enh=jnp.asarray(card_enh), card_ed=jnp.asarray(card_ed),
        card_seal=jnp.asarray(card_seal),
        jokers=jnp.asarray(jokers), joker_n=jnp.asarray(joker_n),
        cons=jnp.asarray(cons), cons_n=jnp.asarray(cons_n),
        cons_slots=jnp.asarray(cons_slots),
        money=jnp.asarray(money),
        round_chips_scored=jnp.asarray(rcs),
        boss_active=jnp.asarray(boss_active), boss_id=jnp.asarray(boss_id),
        boss_played_slots=jnp.asarray(bslots),
        hand_levels=jnp.asarray(hand_levels),
    )


def sample_legal(mask, rng):
    """One coverage-biased legal action per env from a [B, 60] mask."""
    w = mask * WEIGHTS
    none = w.sum(1) == 0
    w[none, 59] = 1.0  # done lanes: feed a no-op id
    cum = np.cumsum(w, axis=1)
    u = rng.random((w.shape[0], 1)) * cum[:, -1:]
    return np.argmax(cum > u, axis=1).astype(np.int32)


def coverage(acts):
    hist = np.bincount(np.asarray(acts).reshape(-1), minlength=60)
    return {name: int(hist[a0:a1].sum()) for name, a0, a1 in (
        ("play", 0, 1), ("discard", 1, 2), ("select", 2, 10),
        ("consumable", 10, 15), ("buy", 20, 30), ("reroll", 30, 31),
        ("end", 31, 32), ("sell", 32, 37), ("blind", 45, 48),
        ("skip", 48, 49))}
