"""Modular ShopPhaseHandler semantics (engine/shop_ext, opt-in rebuild).

Reference: envs/phase_handlers/shop_phase.py:151-321 — eternal-joker sell
block, Egg/Gift Card sell values, Luchador/Swashbuckler sale effects,
per-type purchase rewards, 16-voucher effect table. The flagship parity env
deliberately has none of these (balatro_env_2.py's shop path); this module
carries the modular handler's intended semantics (PARITY #B14).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from balatro_gym_tpu.engine import shop_ext as SE
from balatro_gym_tpu.engine.shop_logic import (
    IT_CARD, IT_JOKER, IT_PACK, IT_VOUCHER)
from balatro_gym_tpu.ops.joker_tables import (
    J_EGG, J_GIFT_CARD, J_JOKER, J_LUCHADOR, J_SWASHBUCKLER,
    JOKER_BASE_COST_NP)


def mk(jokers, eternal=(), money=50, sold=0):
    jok = np.zeros(5, np.int32)
    jok[:len(jokers)] = jokers
    et = np.zeros(5, bool)
    for i in eternal:
        et[i] = True
    return (jnp.asarray(jok), jnp.int32(len(jokers)), jnp.asarray(et),
            jnp.int32(money), jnp.int32(sold))


def test_base_sell_value_formula():
    # max(3, base_cost // 2) — shop_phase.py:274
    jid = J_JOKER  # base cost 2 -> max(3, 1) = 3
    assert int(SE.sell_value(jid)) == 3
    # A costly joker: value = cost // 2
    costly = int(np.argmax(JOKER_BASE_COST_NP))
    assert int(SE.sell_value(costly)) == max(
        3, int(JOKER_BASE_COST_NP[costly]) // 2)


def test_egg_and_gift_card_sell_values():
    assert int(SE.sell_value(J_EGG)) == 5       # :278
    assert int(SE.sell_value(J_GIFT_CARD)) == 0  # :279


def test_sell_joker_basic():
    res = SE.sell_joker(*mk([J_JOKER, J_EGG]), idx=0)
    assert int(res.joker_n) == 1
    assert int(res.jokers[0]) == J_EGG and int(res.jokers[1]) == 0
    assert int(res.money) == 50 + 3
    assert float(res.reward) == pytest.approx(0.3)
    assert int(res.jokers_sold) == 1


def test_eternal_block():
    # shop_phase.py:169-171: eternal joker sale fails with -1, no change.
    res = SE.sell_joker(*mk([J_JOKER, J_EGG], eternal=(0,)), idx=0)
    assert float(res.reward) == -1.0
    assert int(res.joker_n) == 2 and int(res.money) == 50
    # The non-eternal slot still sells, and the eternal MASK shifts with
    # the slots (selling slot 1 keeps slot 0 eternal).
    res = SE.sell_joker(*mk([J_JOKER, J_EGG], eternal=(0,)), idx=1)
    assert float(res.reward) == pytest.approx(0.5)
    assert bool(res.eternal[0])


def test_gift_card_sells_for_nothing():
    res = SE.sell_joker(*mk([J_GIFT_CARD]), idx=0)
    assert int(res.joker_n) == 0
    assert int(res.money) == 50          # value 0
    assert float(res.reward) == 0.0      # 0 / 10
    assert int(res.jokers_sold) == 1     # the sale itself still happened


def test_luchador_sale_effect():
    res = SE.sell_joker(*mk([J_LUCHADOR]), idx=0)
    assert bool(res.boss_disabled)
    res = SE.sell_joker(*mk([J_JOKER]), idx=0)
    assert not bool(res.boss_disabled)


def test_swashbuckler_bonus_counts_itself():
    # jokers_sold increments BEFORE sale effects (:182 vs :190): with 2
    # prior sales, selling Swashbuckler pays bonus = 3.
    res = SE.sell_joker(*mk([J_SWASHBUCKLER], sold=2), idx=0)
    assert int(res.swash_bonus) == 3
    base = int(SE.sell_value(J_SWASHBUCKLER))
    assert int(res.money) == 50 + base + 3


def test_invalid_index():
    res = SE.sell_joker(*mk([J_JOKER]), idx=3)
    assert float(res.reward) == -1.0
    assert int(res.joker_n) == 1


def test_purchase_rewards():
    # shop_phase.py:151-158
    assert float(SE.purchase_reward(IT_PACK)) == 5.0
    assert float(SE.purchase_reward(IT_JOKER)) == 15.0
    assert float(SE.purchase_reward(IT_CARD)) == 3.0
    assert float(SE.purchase_reward(IT_VOUCHER)) == 10.0


def test_voucher_table():
    # 16 vouchers, descriptions verbatim (shop_phase.py:300-321).
    assert len(SE.VOUCHER_NAMES_16) == 16
    assert SE.voucher_effect("Overstock") == "+1 card slot in shop"
    assert SE.voucher_effect("Liquidation") == "All items in shop are 50% off"
    assert SE.voucher_effect("Nope") == "Unknown voucher effect"
    # Dense tables line up with the name order.
    i = SE.VOUCHER_NAMES_16.index("Clearance Sale")
    assert int(SE.VOUCHER_KIND[i]) == SE.VE_DISCOUNT_PCT
    assert int(SE.VOUCHER_MAG[i]) == 25
