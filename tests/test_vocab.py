from sbl_for_multilingual_lip_reading_tpu import vocab as V


def test_unified_vocab_is_58():
    assert len(V.TOTAL_PHONEMES) == 58
    assert V.TOTAL_PHONEMES[V.SOS_ID] == "sos"
    assert V.TOTAL_PHONEMES[V.EOS_ID] == "eos"
    assert len(set(V.TOTAL_PHONEMES)) == 58


def test_project_vocab_sizes():
    # reference config.py vocab_size values: 42 (LRW), 48 (LRW1000), 58 (SBL)
    assert len(V.LRW_PHONEMES) == 42
    assert len(V.LRW1000_PHONEMES) == 48
    assert set(V.LRW1000_PHONEMES[2:]) <= set(V.TOTAL_PHONEMES)


def test_generator_reproduces_frozen_vocab():
    # generate_phonemes.py pipeline must rebuild the canonical 58-token list
    assert V.build_unified_vocab() == V.TOTAL_PHONEMES


def test_word_lists():
    assert len(V.lrw_words()) == 500
    assert len(V.lrw1000_words()) == 1000
    assert len(V.words_1500()) == 1500
    assert V.words_1500()[:500] == V.lrw_words()


def test_english_encoding_about():
    # ABOUT -> AH0 B AW1 T -> e1 b au t (english_phonemes.txt mapping)
    phs = V.word_to_phonemes("ABOUT")
    assert phs == ["e1", "b", "au", "t"]
    ids = V.encode_english_word("ABOUT")
    assert ids == [V.TOTAL_PHONEMES.index(p) for p in phs]
    assert all(0 <= i < 58 for i in ids)


def test_every_lrw_word_encodes():
    for w in V.lrw_words():
        ids = V.encode_english_word(w)
        assert len(ids) >= 1
        # target buffer is 14 tokens (reference data_gen.py:300)
        assert len(ids) <= 14, w


def test_pinyin_encoding():
    # 'bao' -> b au (chinese_phonemes.txt)
    assert V.pinyin_to_phonemes(["bao"]) == ["b", "au"]
    ids = V.encode_pinyin_seq(["bao", "gao"])
    assert ids == [V.TOTAL_PHONEMES.index(p) for p in ["b", "au", "g", "au"]]


def test_every_lrw1000_word_encodes():
    # entries may be multi-syllable ("jue de"); split like data_gen.py:162.
    # The reference filters out the bogus labels 'C' and 'n'
    # (data_gen.py:156-158) -- do the same here.
    cmap = V.chinese_phoneme_map()
    skipped = 0
    for w in V.lrw1000_words():
        sylls = w.split(" ")
        if any(s not in cmap for s in sylls):
            skipped += 1
            continue
        ids = V.encode_pinyin_seq(sylls)
        assert 1 <= len(ids) <= 14
    assert skipped <= 3


def test_decode_strips_specials():
    ids = [V.SOS_ID, 2, 3, V.EOS_ID, V.IGNORE_ID]
    assert V.decode_ids(ids) == ["s", "p"]
    assert V.decode_ids(ids, strip_special=False) == ["sos", "s", "p", "eos"]
