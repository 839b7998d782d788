"""Visual spell checker goldens
(reference: /root/reference/utils/spell_check_utils.py:98-245)."""

from effocr_spark.functions.spellcheck import (
    create_common_abbrev,
    create_homoglyph_dict,
    create_worddict,
    depunctuate,
    is_initial,
    is_number,
    majority_normalize,
    visual_spell_checker,
)

WD = create_worddict()
SD = create_homoglyph_dict()
AB = create_common_abbrev()


def check(s):
    return visual_spell_checker(s, WD, SD, AB)


def test_homoglyph_correction():
    # 'f'→'t' homoglyph turns 'fhe' into dictionary word 'the'
    assert check("fhe") == "the"


def test_word_left_alone():
    assert check("the cat and the dog") == "the cat and the dog"


def test_number_left_alone():
    assert check("1874") == "1874"


def test_all_caps_left_alone():
    assert check("NASA") == "NASA"


def test_majority_normalize_digit_in_word():
    # mostly-alpha token: interior digit homoglyph-normalized to a letter
    assert majority_normalize("w0rd", SD) == "wOrd"


def test_majority_normalize_alpha_in_number():
    assert majority_normalize("1O0", SD) == "100"


def test_depunctuate_and_predicates():
    assert depunctuate("a,b.c-") == "abc"
    assert is_number("1,000.")
    assert is_initial("J.")
    assert not is_initial("Jo")


def test_splitters_preserved():
    out = check('fhe/fhe "fhe"')
    assert out == 'the/the "the"'
