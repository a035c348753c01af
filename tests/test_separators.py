from xhs_ocr_ray.layout.separators import is_cjk_char, join_fragments, word_separator


def test_cjk_pairs_join_empty():
    assert word_separator("中文", "文本") == ""
    assert word_separator("テキスト", "です") == ""
    assert word_separator("한국", "어") == ""
    assert word_separator("全角，", "中") == ""  # fullwidth punct is CJK-family


def test_latin_pairs_space():
    assert word_separator("hello", "world") == " "


def test_hyphen_joins():
    assert word_separator("co-", "operate") == ""


def test_punctuation_joins_left():
    assert word_separator("end", ".") == ""
    assert word_separator("word", ", next") == ""


def test_mixed_cjk_latin_space():
    assert word_separator("中文", "English") == " "
    assert word_separator("English", "中文") == " "


def test_empty_edges():
    assert word_separator("", "x") == ""
    assert word_separator("x", "") == ""


def test_is_cjk_char():
    assert is_cjk_char("中")
    assert is_cjk_char("ア")
    assert is_cjk_char("한")
    assert not is_cjk_char("a")
    assert not is_cjk_char(".")


def test_join_fragments():
    assert join_fragments(["hello", "world"]) == "hello world"
    assert join_fragments(["中文", "文本"]) == "中文文本"
    assert join_fragments(["a", "", "b"]) == "a b"
    # separator depends on the previous *fragment*, not a previous separator
    assert join_fragments(["x", "y", "中", "文"]) == "x y 中文"
