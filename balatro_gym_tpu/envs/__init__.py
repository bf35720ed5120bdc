"""Gym-compatible environment shells (host-side, jitted device cores)."""
from balatro_gym_tpu.envs.balatro_env import (  # noqa: F401
    BalatroEnvValidator,
    BalatroGymEnv,
    make_balatro_env,
)
from balatro_gym_tpu.envs.eight_card_draw import (  # noqa: F401
    EightCardDrawGymEnv,
    make,
)
from balatro_gym_tpu.envs.macro_env import BalatroMacroGymEnv  # noqa: F401
from balatro_gym_tpu.envs.small_env import BalatroSmallGymEnv  # noqa: F401
