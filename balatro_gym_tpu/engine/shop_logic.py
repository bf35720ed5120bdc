"""Shop inventory generation and economy as pure jitted functions.

Mirrors ``Shop`` (reference: balatro_gym/shop.py:93-205) with the flagship
env's wiring quirks preserved (balatro_env_2.py:1174-1253, 1383-1399):

* Inventory = 3 packs (Standard, Joker, one of Tarot/Planet/Spectral) +
  3 distinct unowned jokers + 1 voucher + 2 random single cards (cost 40,
  NOT ante-scaled — shop.py:139).
* Cost multiplier 1.15^(ante-1), ×0.9 with the Magic Trick voucher
  (shop.py:105-109); each item cost is int(base * mult).
* Reroll: charge int(base * mult), then base = int(base * 1.35); base resets
  to 50 on every shop (re)generation because the env rebuilds the Shop object
  each visit (balatro_env_2.py:1390, shop.py:101).
* BUG-FAITHFUL: bought cards/pack contents are appended to a PlayerState.deck
  that is never synced back into the game state (balatro_env_2.py:1225-1244
  syncs only money/jokers/vouchers) — so card & pack purchases cost money and
  yield reward but the cards vanish. Replicated by doing nothing.
* Buying pops the item; later items shift left (shop.py:188).

Item type codes follow the reference's ``ItemType``: PACK=1, CARD=2, JOKER=3,
VOUCHER=4 (shop.py:17-21, auto() starts at 1); 0 = empty slot.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from balatro_gym_tpu.core import pow_tables as PT
from balatro_gym_tpu.core import rng as R

from balatro_gym_tpu.ops.joker_tables import JOKER_BASE_COST_NP, NUM_JOKERS

SHOP_SLOTS = 10
N_ITEMS = 9  # 3 packs + 3 jokers + 1 voucher + 2 cards

# ItemType codes (shop.py:17-21)
IT_EMPTY, IT_PACK, IT_CARD, IT_JOKER, IT_VOUCHER = 0, 1, 2, 3, 4

# Pack kinds (shop_item payload for IT_PACK)
PACK_STANDARD, PACK_JOKER, PACK_TAROT, PACK_PLANET, PACK_SPECTRAL = 0, 1, 2, 3, 4
PACK_COSTS = jnp.asarray(np.array([250, 500, 600, 900, 1300], dtype=np.int32))

# Voucher ids (bit positions in the voucher bitset)
V_MAGIC_TRICK, V_MINIMALIST = 0, 1
VOUCHER_COSTS = jnp.asarray(np.array([600, 750], dtype=np.int32))
VOUCHER_NAMES = ("Magic Trick", "Minimalist")

CARD_COST = 40
REROLL_BASE = 50
REROLL_GROWTH = 1.35
ANTE_COST_MULT = 1.15

_ELIGIBLE = jnp.asarray(JOKER_BASE_COST_NP > 0)  # base_cost>0 ⇒ shop-eligible
_JCOST = jnp.asarray(JOKER_BASE_COST_NP.astype(np.int32))


def cost_mult(ante, vouchers):
    """1.15^(ante-1), ×0.9 with Magic Trick (shop.py:105-109).

    Table dot, not lax.pow: numpy-f64-minted 1.15^k = the reference's
    CPython float, backend-independent once rounded to f32
    (core/pow_tables.py docstring)."""
    m = PT.pow115(ante - 1, jnp.float32)
    has_magic = (vouchers >> V_MAGIC_TRICK) & 1
    return m * jnp.where(has_magic == 1, 0.9, 1.0)


def generate_inventory(key, ante, owned_jokers, vouchers):
    """Fresh 9-item inventory. Returns (types[10] i32, items[10] i32,
    costs[10] i32, n i32).

    owned_jokers: [5] joker ids (0 = empty) — excluded from the joker slots
    (shop.py:124).
    """
    k_pack, k_jok, k_vouch, k_cards = jax.random.split(key, 4)
    mult = cost_mult(ante, vouchers)

    types = jnp.zeros(SHOP_SLOTS, jnp.int32)
    items = jnp.zeros(SHOP_SLOTS, jnp.int32)
    costs = jnp.zeros(SHOP_SLOTS, jnp.int32)

    # Slots 0-2: packs — Standard, Joker, choice(Tarot/Planet/Spectral).
    third = jax.random.randint(k_pack, (), PACK_TAROT, PACK_SPECTRAL + 1, dtype=jnp.int32)
    pack_kind = jnp.stack([jnp.int32(PACK_STANDARD), jnp.int32(PACK_JOKER), third])
    types = types.at[0:3].set(IT_PACK)
    items = items.at[0:3].set(pack_kind)
    costs = costs.at[0:3].set(
        jnp.trunc(PACK_COSTS[pack_kind].astype(jnp.float32) * mult).astype(jnp.int32))

    # Slots 3-5: three distinct unowned jokers — top-3 of iid uniform
    # PACKED priority words over the eligibility mask, a uniform sample
    # without replacement (shop.py:124-125 rng.sample). Integer keys
    # instead of Gumbel so the fused full-env kernel can replay the
    # identical draws bit-exactly via ops/kernel_rng. The word packs
    # key20 (bits 31-12) | base_cost4 (bits 11-8) | 255-id (bits 7-0):
    # the unique id payload makes every word distinct (ties impossible,
    # and the packed word is never 0, so it never collides with the
    # I32_MIN disabled sentinel), and the cost/id payloads let the fused
    # kernel run ONE top-3 min/max insertion cascade with no per-pass
    # argmax+knockout and no separate id/cost lookups
    # (ops/fused_full_rollout._shop_gen mirrors these words bit-for-bit).
    # Key truncation 32->20 bits biases key-ties toward the higher packed
    # payload with P ~ (151^2/2)*2^-20 ~ 1% per generation of ANY tie
    # existing (~0.04% of generations change a winner) — negligible
    # distributionally, and deterministic/identical on both paths.
    # One-hot any-match, NOT a bool scatter-set (XLA:TPU silently drops dynamic-index BOOL scatter updates in vmapped programs).
    owned_oh = jnp.any(
        jnp.arange(NUM_JOKERS)[:, None]
        == jnp.clip(owned_jokers, 0, NUM_JOKERS - 1)[None, :], axis=1)
    eligible = _ELIGIBLE & ~owned_oh
    # Ordering runs in the sign-flipped i32 domain (core.rng.sort_key_i32):
    # u32 argmax mis-orders on XLA:TPU inside fused programs, and the fused
    # kernel compares i32 anyway — this keeps every backend bit-identical.
    bits = jax.random.bits(k_jok, (NUM_JOKERS,), jnp.uint32)
    packed = ((bits & jnp.uint32(0xFFF00000))
              | (_JCOST.astype(jnp.uint32) << 8)
              | (jnp.uint32(255) - jnp.arange(NUM_JOKERS, dtype=jnp.uint32)))
    g = R.sort_key_i32(packed, eligible)
    # Iterated argmax instead of top_k: top_k lowers to a full sort on TPU,
    # and this runs inside every env step (shop regeneration branch).
    jids = []
    for _ in range(3):
        j = jnp.argmax(g)
        jids.append(j)
        g = g.at[j].set(jnp.int32(R.I32_MIN))
    jids = jnp.stack(jids)
    types = types.at[3:6].set(IT_JOKER)
    items = items.at[3:6].set(jids.astype(jnp.int32))
    costs = costs.at[3:6].set(
        jnp.trunc(_JCOST[jids].astype(jnp.float32) * mult).astype(jnp.int32))

    # Slot 6: voucher (choice of 2, shop.py:131).
    vid = jax.random.randint(k_vouch, (), 0, 2, dtype=jnp.int32)
    types = types.at[6].set(IT_VOUCHER)
    items = items.at[6].set(vid)
    costs = costs.at[6].set(
        jnp.trunc(VOUCHER_COSTS[vid].astype(jnp.float32) * mult).astype(jnp.int32))

    # Slots 7-8: two random cards, flat cost 40 (shop.py:137-139).
    cards = jax.random.randint(k_cards, (2,), 0, 52, dtype=jnp.int32)
    types = types.at[7:9].set(IT_CARD)
    items = items.at[7:9].set(cards)
    costs = costs.at[7:9].set(CARD_COST)

    return types, items, costs, jnp.int32(N_ITEMS)


def pop_item(types, items, costs, n, idx):
    """Remove item idx, shifting the tail left (list.pop semantics)."""
    slots = jnp.arange(SHOP_SLOTS)

    # Keep entries before idx, shift after, zero the tail.
    def take(a):
        shifted = a[jnp.clip(slots + 1, 0, SHOP_SLOTS - 1)]
        out = jnp.where(slots < idx, a, shifted)
        return jnp.where(slots < n - 1, out, 0)

    return take(types), take(items), take(costs), n - 1


def reroll_charge(reroll_base, ante, vouchers):
    """(cost to charge now, next base) — shop.py:170-176."""
    mult = cost_mult(ante, vouchers)
    cost = jnp.trunc(reroll_base.astype(jnp.float32) * mult).astype(jnp.int32)
    next_base = jnp.trunc(reroll_base.astype(jnp.float32) * REROLL_GROWTH).astype(jnp.int32)
    return cost, next_base


def displayed_reroll_cost(ante, vouchers):
    """state.shop_reroll_cost as synced at shop generation
    (balatro_env_2.py:1392) — int(50 * mult). NOT updated after rerolls
    (bug-faithful: the action mask uses this stale value)."""
    mult = cost_mult(ante, vouchers)
    return jnp.trunc(jnp.float32(REROLL_BASE) * mult).astype(jnp.int32)
