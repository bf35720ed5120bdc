"""Modular ShopPhaseHandler semantics: opt-in rebuild (the pack_logic pattern).

Reference: ``envs/phase_handlers/shop_phase.py:20-325`` — the modular shop
handler the reference ships but never runs (the modular env that would drive
it cannot import — six missing modules, balatro_env_small.py:13-19; the
flagship env's shop path is ``balatro_env_2.py:1174-1253``, rebuilt in
``engine/shop_logic`` + ``full_env._step_shop_phase``). Like
``engine/pack_logic``, this module rebuilds the handler's DOCUMENTED
semantics as pure jittable transforms, opt-in — the parity env keeps the
flagship behavior, where none of these effects exist:

* **eternal-joker sell block** (shop_phase.py:169-171): selling index j
  fails with -1 if j is in ``eternal_jokers`` (a POSITION set in the
  reference's state, envs/state.py:138-140 — reproduced as a [5] bool mask).
* **special sell values** (shop_phase.py:273-287): base ``max(3,
  base_cost // 2)``; Egg always 5; Gift Card always 0 (can't be sold for
  money — the sale still goes through, it just pays nothing).
* **sale effects** (shop_phase.py:289-298): Luchador → 'boss blind disabled
  this round' flag; Swashbuckler → bonus money equal to ``jokers_sold``
  (the state counter BEFORE this sale increments it — the handler
  increments ``jokers_sold`` at :182, then applies sale effects at :190,
  so the bonus INCLUDES the Swashbuckler sale itself).
* **sell reward** ``sell_value / 10`` (shop_phase.py:187).
* **per-type purchase rewards** (shop_phase.py:151-158): pack 5, joker 15,
  card 3, voucher 10.
* **16-voucher effect table** (shop_phase.py:300-321): in the reference
  this is DESCRIPTIVE metadata only — ``_get_voucher_effect`` returns an
  info string; no voucher effect is ever applied by the handler. Rebuilt as
  a dense effect-kind table (id, kind, magnitude) + the name/description
  map, so a consumer can either display it (reference behavior) or apply
  it (intended semantics); this module only exposes the data.

All branch-free jnp (lax.select/where) over the fixed [5]-joker state —
no Python control flow on traced values.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.ops.joker_tables import (
    J_EGG,
    J_GIFT_CARD,
    J_LUCHADOR,
    J_SWASHBUCKLER,
    JOKER_BASE_COST_NP,
)

MAX_JOKERS = 5

# ---------------------------------------------------------------------------
# Sell values (shop_phase.py:273-287)
# ---------------------------------------------------------------------------

_sell = np.maximum(3, JOKER_BASE_COST_NP.astype(np.int64) // 2).astype(np.int32)
_sell[0] = 0              # id 0 = empty slot
_sell[J_EGG] = 5          # 'Egg gains value over time' (:278)
_sell[J_GIFT_CARD] = 0    # "Gift cards can't be sold" (:279)
SELL_VALUE = jnp.asarray(_sell)


def sell_value(joker_id):
    """Sell value of a joker id (special-cased Egg/Gift Card)."""
    return SELL_VALUE[jnp.clip(joker_id, 0, SELL_VALUE.shape[0] - 1)]


# ---------------------------------------------------------------------------
# Purchase rewards (shop_phase.py:151-158), indexed by shop_logic item type.
# ---------------------------------------------------------------------------

from balatro_gym_tpu.engine.shop_logic import (  # noqa: E402
    IT_CARD,
    IT_JOKER,
    IT_PACK,
    IT_VOUCHER,
)

_prew = np.zeros(8, np.float32)
_prew[IT_PACK] = 5.0
_prew[IT_JOKER] = 15.0
_prew[IT_CARD] = 3.0
_prew[IT_VOUCHER] = 10.0
PURCHASE_REWARD = jnp.asarray(_prew)


def purchase_reward(item_type):
    """Modular handler's fixed per-type buy reward (flagship env uses its
    own shaping instead — full_env._shop_buy)."""
    return PURCHASE_REWARD[jnp.clip(item_type, 0, 7)]


# ---------------------------------------------------------------------------
# Sell step (shop_phase.py:162-221)
# ---------------------------------------------------------------------------


class SellResult(NamedTuple):
    jokers: jnp.ndarray        # [5] i32 post-sale (shifted down)
    joker_n: jnp.ndarray       # i32
    eternal: jnp.ndarray       # [5] bool mask, shifted with the slots
    money: jnp.ndarray         # i32 post-sale
    jokers_sold: jnp.ndarray   # i32 counter (incremented on success)
    reward: jnp.ndarray        # f32: sell_value/10, or -1 on block/invalid
    sold_id: jnp.ndarray       # i32, 0 if nothing sold
    boss_disabled: jnp.ndarray  # bool: Luchador sale effect fired
    swash_bonus: jnp.ndarray   # i32: Swashbuckler bonus money granted


def sell_joker(jokers, joker_n, eternal, money, jokers_sold, idx) -> SellResult:
    """One SELL_JOKER action under the modular handler's rules.

    jokers: [5] i32 ids; joker_n: i32; eternal: [5] bool (position-keyed,
    like the reference's ``eternal_jokers`` set); idx: i32 slot to sell.
    """
    idx = jnp.asarray(idx, jnp.int32)
    slots = jnp.arange(MAX_JOKERS)
    valid = (idx >= 0) & (idx < joker_n)
    blocked = valid & eternal[jnp.clip(idx, 0, MAX_JOKERS - 1)]
    ok = valid & ~blocked

    sold_id = jnp.where(ok, jokers[jnp.clip(idx, 0, MAX_JOKERS - 1)], 0)
    value = jnp.where(ok, sell_value(sold_id), 0)

    # Shift the sold slot out (jokers and the eternal mask move together).
    shifted = jokers[jnp.clip(slots + 1, 0, MAX_JOKERS - 1)]
    e_shift = eternal[jnp.clip(slots + 1, 0, MAX_JOKERS - 1)]
    new_jok = jnp.where(slots < idx, jokers, shifted)
    new_et = jnp.where(slots < idx, eternal, e_shift)
    new_jok = jnp.where(slots >= joker_n - 1, 0, new_jok)
    new_et = jnp.where(slots >= joker_n - 1, False, new_et)
    jokers = jnp.where(ok, new_jok, jokers)
    eternal = jnp.where(ok, new_et, eternal)
    joker_n = joker_n - jnp.where(ok, 1, 0)

    # jokers_sold increments BEFORE sale effects (:182 vs :190), so a
    # Swashbuckler sale's bonus counts itself.
    jokers_sold = jokers_sold + jnp.where(ok, 1, 0)
    is_swash = ok & (sold_id == J_SWASHBUCKLER)
    swash_bonus = jnp.where(is_swash, jokers_sold, 0)
    boss_disabled = ok & (sold_id == J_LUCHADOR)

    money = money + value + swash_bonus
    reward = jnp.where(ok, value.astype(jnp.float32) / 10.0,
                       jnp.float32(-1.0))
    return SellResult(jokers, joker_n, eternal, money, jokers_sold, reward,
                      sold_id, boss_disabled, swash_bonus)


# ---------------------------------------------------------------------------
# Voucher effect table (shop_phase.py:300-321) — descriptive metadata in the
# reference; encoded as (kind, magnitude) data for consumers that want to
# apply the intended semantics.
# ---------------------------------------------------------------------------

(VE_SHOP_SLOT, VE_DISCOUNT_PCT, VE_EDITION_RATE, VE_REROLL_DISCOUNT,
 VE_CONS_SLOT, VE_TELESCOPE, VE_EXTRA_HAND, VE_PACK_RATE, VE_HAND_SIZE,
 VE_EXTRA_DISCARD, VE_TAROT_RATE, VE_PLANET_RATE, VE_INTEREST) = range(13)

# name -> (effect kind, magnitude, description verbatim from :300-321)
VOUCHER_EFFECTS = {
    "Overstock": (VE_SHOP_SLOT, 1, "+1 card slot in shop"),
    "Clearance Sale": (VE_DISCOUNT_PCT, 25, "All items in shop are 25% off"),
    "Hone": (VE_EDITION_RATE, 2,
             "Foil, Holographic, and Polychrome cards appear 2X more often"),
    "Reroll Surplus": (VE_REROLL_DISCOUNT, 2, "Rerolls cost $2 less"),
    "Crystal Ball": (VE_CONS_SLOT, 1, "+1 consumable slot"),
    "Telescope": (VE_TELESCOPE, 1,
                  "Celestial Packs always contain your most used poker "
                  "hand's Planet card"),
    "Grabber": (VE_EXTRA_HAND, 1, "+1 hand per round"),
    "Dusk": (VE_PACK_RATE, 2,
             "Tarot and Planet cards appear 2X more often in the shop"),
    "Retcon": (VE_REROLL_DISCOUNT, 2, "Rerolls cost $2 less (again)"),
    "Paint Brush": (VE_HAND_SIZE, 1, "+1 hand size"),
    "Overstock Plus": (VE_SHOP_SLOT, 1, "+1 card slot in shop (again)"),
    "Liquidation": (VE_DISCOUNT_PCT, 50, "All items in shop are 50% off"),
    "Wasteful": (VE_EXTRA_DISCARD, 1, "Permanently gain +1 discard every round"),
    "Tarot Merchant": (VE_TAROT_RATE, 2,
                       "Tarot cards appear 2X more often in the shop"),
    "Planet Merchant": (VE_PLANET_RATE, 2,
                        "Planet cards appear 2X more often in the shop"),
    "Seed Money": (VE_INTEREST, 5,
                   "Gain $1 interest for every $5 you have at the end of "
                   "the round"),
}
VOUCHER_NAMES_16 = tuple(VOUCHER_EFFECTS)
# Dense [16] arrays (index = position in VOUCHER_NAMES_16).
VOUCHER_KIND = jnp.asarray(
    np.array([VOUCHER_EFFECTS[n][0] for n in VOUCHER_NAMES_16], np.int32))
VOUCHER_MAG = jnp.asarray(
    np.array([VOUCHER_EFFECTS[n][1] for n in VOUCHER_NAMES_16], np.int32))


def voucher_effect(name: str) -> str:
    """Reference behavior verbatim: description lookup with the handler's
    fallback string (shop_phase.py:323)."""
    eff = VOUCHER_EFFECTS.get(name)
    return eff[2] if eff else "Unknown voucher effect"
