from playaid_core_tpu.ontology import (
    ANIM_FILE_TO_ANIMATION,
    FIGHTER_ENUM_TO_NAME,
    FIGHTER_NAME_TO_ENUM,
    HEX_TO_ACTION,
    MOVE_TO_CLASS_ID,
    ONE_INDEXED_MOVE_TO_CLASS_ID,
    ONTOLOGY,
    PARAM_STRING_TO_ANIMATION,
    STAGE_ENUM_TO_DATA,
    STATUS_ENUM_TO_STRING,
    TRAINED_ACTIONS_2_17,
    get_anim_for_string_and_status_kind,
    get_animation_type_for_param_string,
)


def test_derived_map_sizes():
    # Sizes from the reference survey (anim_ontology.py:7-788).
    assert sum(len(v) for v in ONTOLOGY.values()) == 63
    assert len(MOVE_TO_CLASS_ID) == 63
    assert len(FIGHTER_ENUM_TO_NAME) == 94
    assert len(STAGE_ENUM_TO_DATA) == 18
    assert len(TRAINED_ACTIONS_2_17) == 46
    assert len(HEX_TO_ACTION) > 80000


def test_class_ids_dense_and_one_indexed():
    ids = sorted(MOVE_TO_CLASS_ID.values())
    assert ids == list(range(63))
    for move, cid in MOVE_TO_CLASS_ID.items():
        assert ONE_INDEXED_MOVE_TO_CLASS_ID[move] == cid + 1


def test_hex_spot_checks():
    # Rows straight out of params_labels.csv (game data).
    assert HEX_TO_ACTION["0x02302d482a"] == "-1"
    assert get_animation_type_for_param_string("attack_s4") == "ForwardSmash"
    assert get_animation_type_for_param_string("wait") == "Wait"
    assert get_animation_type_for_param_string("nonexistent_xyz") == "Undefined"


def test_prefix_fallback():
    # Suffixed param strings resolve through the prefix fallback.
    assert get_animation_type_for_param_string("damage_hi_1") == "Damaged"
    assert get_animation_type_for_param_string("attack_air_f_something") == "ForwardAir"


def test_shield_stun_status_override():
    # Status 30 is GUARD_DAMAGE -> ShieldStun regardless of param string.
    assert STATUS_ENUM_TO_STRING[30] == "FIGHTER_STATUS_KIND_GUARD_DAMAGE"
    assert get_anim_for_string_and_status_kind("wait", 30) == "ShieldStun"
    assert get_anim_for_string_and_status_kind("wait", 0) == "Wait"


def test_fighter_and_stage_enums():
    assert FIGHTER_ENUM_TO_NAME[86] == "Byleth"
    assert FIGHTER_ENUM_TO_NAME[8] == "Pikachu"
    assert FIGHTER_NAME_TO_ENUM["Joker"] == 82
    assert STAGE_ENUM_TO_DATA[95] == {"name": "TOWN_AND_CITY", "fov": 30}
    assert STAGE_ENUM_TO_DATA[86]["name"] == "YOSHI_ISLAND_OMEGA"


def test_anim_file_map():
    assert ANIM_FILE_TO_ANIMATION["c00attack1"] == "Jab"
    assert PARAM_STRING_TO_ANIMATION["cliff_wait"] == "LedgeHang"
