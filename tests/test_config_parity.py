"""Every reference config name resolves (cfg/task/*.yaml, cfg/train/*.yaml).

The reference selects tasks with ``task=<Name>`` where <Name> is any of the
48 cfg/task yamls (variants resolve to a base class via their ``name:`` field
or Hydra ``defaults:`` list) and train configs with ``train=<Name>PPO`` over
the 44 cfg/train yamls.  Our registry must cover the same surface.
"""
import pytest

from isaacgymenvs_ma_tpu.tasks import registry
from isaacgymenvs_ma_tpu.learning.configs import train_default_config, _TRAIN

# the 48 cfg/task/*.yaml names (reference snapshot; 'env' omitted — it is the
# Hydra per-run output subdir config, not a task)
REF_TASK_CFGS = [
    "AllegroHand", "AllegroHandDextremeADR", "AllegroHandDextremeManualDR",
    "AllegroHandFF", "AllegroHandLSTM", "AllegroHandLSTM_Big",
    "AllegroKuka", "AllegroKukaLSTM", "AllegroKukaTwoArmsLSTM",
    "Ant", "AntSAC", "Anymal", "AnymalTerrain", "BallBalance", "Cartpole",
    "FactoryBase", "FactoryEnvGears", "FactoryEnvInsertion",
    "FactoryEnvNutBolt", "FactoryTaskGears", "FactoryTaskInsertion",
    "FactoryTaskNutBoltPick", "FactoryTaskNutBoltPlace",
    "FactoryTaskNutBoltScrew", "FrankaCabinet", "FrankaCollectMA",
    "FrankaCombineMA", "FrankaCubeStack", "FrankaCubeStack2", "FrankaPPMA",
    "FrankaReach", "FrankaReachMA", "Humanoid", "HumanoidAMP",
    "HumanoidAMPHands", "HumanoidSAC", "IndustRealBase", "IndustRealEnvGears",
    "IndustRealEnvPegs", "IndustRealTaskGearsInsert",
    "IndustRealTaskPegsInsert", "Ingenuity", "Quadcopter", "ShadowHand",
    "ShadowHandOpenAI_FF", "ShadowHandOpenAI_LSTM", "ShadowHandTest",
    "Trifinger",
]

# the 44 cfg/train/*.yaml names
REF_TRAIN_CFGS = [
    "AllegroHandDextremeADRPPO", "AllegroHandDextremeManualDRPPO",
    "AllegroHandLSTMPPO", "AllegroHandLSTM_BigPPO", "AllegroHandPPO",
    "AllegroKukaLSTMPPO", "AllegroKukaPPO", "AllegroKukaTwoArmsLSTMPPO",
    "AntPPO", "AntSAC", "AnymalPPO", "AnymalTerrainPPO",
    "AnymalTerrainPPO_LSTM", "BallBalancePPO", "CartpolePPO",
    "FactoryTaskGearsPPO", "FactoryTaskInsertionPPO",
    "FactoryTaskNutBoltPickPPO", "FactoryTaskNutBoltPlacePPO",
    "FactoryTaskNutBoltScrewPPO", "FrankaCabinetPPO", "FrankaCollectMAPPO",
    "FrankaCombineMAPPO", "FrankaCubeStack2PPO", "FrankaCubeStackPPO",
    "FrankaPPMAPPO", "FrankaReachMAPPO", "FrankaReachPPO", "HumanoidAMPPPO",
    "HumanoidAMPPPOLowGP", "HumanoidPPO", "HumanoidSAC",
    "IndustRealTaskGearsInsertPPO", "IndustRealTaskPegsInsertPPO",
    "IngenuityPPO", "QuadcopterPPO", "ShadowHandOpenAIPPO",
    "ShadowHandOpenAI_FFPPO", "ShadowHandOpenAI_LSTMPPO", "ShadowHandPPO",
    "ShadowHandPPOAsymm", "ShadowHandPPOAsymmLSTM", "ShadowHandPPOLSTM",
    "TrifingerPPO",
]

CONFIG_ONLY = {"FactoryBase", "FactoryEnvGears", "FactoryEnvInsertion",
               "FactoryEnvNutBolt", "IndustRealBase", "IndustRealEnvGears",
               "IndustRealEnvPegs"}


@pytest.mark.parametrize("name", REF_TASK_CFGS)
def test_task_config_resolves(name):
    cfg = registry.task_default_config(name)
    assert isinstance(cfg, dict) and "env" in cfg and "sim" in cfg
    if name not in CONFIG_ONLY:
        assert registry.task_class(name) is not None


@pytest.mark.parametrize("name", REF_TRAIN_CFGS)
def test_train_config_resolves(name):
    cfg = train_default_config(name)
    p = cfg["params"]
    assert p["algo"]["name"] in ("a2c_continuous", "a2c_continuous_MA",
                                 "amp_continuous", "sac")
    assert "config" in p and "network" in p
    # yaml-name lookups must hit a registered entry, not the generic default
    base = name[:-3] if name.endswith("PPO") and name[:-3] in _TRAIN else name
    assert base in _TRAIN or name in _TRAIN, f"{name} fell through to _base"


def test_variant_deltas_applied():
    sh = registry.task_default_config("ShadowHandOpenAI_FF")
    assert sh["env"]["observationType"] == "openai"
    assert sh["env"]["asymmetric_observations"] is True
    assert sh["env"]["numEnvs"] == 16384
    test = registry.task_default_config("ShadowHandTest")
    assert test["env"]["numEnvs"] == 256 and test["env"]["forceScale"] == 0.0
    hands = registry.task_default_config("HumanoidAMPHands")
    assert "right_hand" in hands["env"]["contactBodies"]
    assert hands["env"]["motion_file"] == "amp_humanoid_cartwheel.npy"
    # variant classes resolve to their base task class
    from isaacgymenvs_ma_tpu.tasks.shadow_hand import ShadowHand
    assert registry.task_class("ShadowHandOpenAI_FF") is ShadowHand


def test_lstm_train_variants_have_rnn():
    for name in ("ShadowHandPPOLSTM", "ShadowHandPPOAsymmLSTM",
                 "AllegroHandLSTM", "AllegroHandLSTM_Big",
                 "AnymalTerrainPPO_LSTM", "AllegroKukaLSTM"):
        net = train_default_config(name)["params"]["network"]
        assert net.get("rnn", {}).get("name") == "lstm", name
    big = train_default_config("AllegroHandLSTM_Big")
    assert big["params"]["network"]["rnn"]["units"] == 1024


def test_asymm_central_value():
    cfg = train_default_config("ShadowHandPPOAsymm")["params"]["config"]
    cv = cfg["central_value_config"]
    assert cv["network"]["mlp"]["units"] == [512, 512, 256, 128]


def test_low_gp_variant():
    cfg = train_default_config("HumanoidAMPPPOLowGP")["params"]["config"]
    assert cfg["disc_grad_penalty"] == 0.2


def test_flex_engine_rejected():
    """physics_engine=flex is accepted-but-unimplemented in this build
    (reference selects engines at vec_task.py:236-245; SURVEY.md §2.5)."""
    import pytest
    from isaacgymenvs_ma_tpu.tasks.cartpole import Cartpole, TASK_CFG
    from isaacgymenvs_ma_tpu.utils.config import deep_merge
    with pytest.raises(NotImplementedError, match="flex"):
        Cartpole(deep_merge(TASK_CFG, {"physics_engine": "flex"}))
