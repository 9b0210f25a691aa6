"""Sentence eval + phonetics tests (pure host logic; fast)."""
import numpy as np

from lipreading_video_generation_tpu.pipelines import phonetics, sentence_eval


def test_soundex_known_values():
    # canonical American Soundex examples
    assert phonetics.soundex("ROBERT") == "R163"
    assert phonetics.soundex("RUPERT") == "R163"
    assert phonetics.soundex("ASHCRAFT") == "A261"
    assert phonetics.soundex("TYMCZAK") == "T522"
    assert phonetics.soundex("PFISTER") == "P236"
    assert phonetics.soundex("HONEYMAN") == "H555"


def test_create_phonetics_collapses_homophones():
    vocab = ["ROBERT", "RUPERT", "HELLO"]
    p2l, l2p, w2p, p2w = phonetics.create_phonetics(vocab)
    assert w2p["ROBERT"] == w2p["RUPERT"]
    assert len(p2l) == 2  # two distinct classes
    labels = phonetics.word_labels_to_phonetic_labels([0, 1, 2], vocab, w2p, p2l)
    assert labels[0] == labels[1] != labels[2]


def test_ngram_scorer_prefers_seen_sentences():
    s = sentence_eval.NgramScorer().fit(["the cat sat", "the dog ran", "the cat ran"])
    assert s("the cat sat") > s("sat the cat")


def test_beam_search_picks_likely_sentence():
    s = sentence_eval.NgramScorer().fit(["hello world again"] * 5 + ["goodbye moon now"] * 5)
    possible = [["HELLO", "GOODBYE"], ["WORLD", "MOON"], ["AGAIN", "NOW"]]
    beams = sentence_eval.beam_search(s, possible, beam_width=4, k=2)
    assert beams[0] in ("HELLO WORLD AGAIN", "GOODBYE MOON NOW")


def test_evaluate_sentences_end_to_end():
    vocab = ["[UNK]", "HELLO", "WORLD", "GOODBYE", "MOON"]
    scorer = sentence_eval.NgramScorer().fit(["hello world", "goodbye moon"])
    # two sentences of two words each; classifier is confident & correct
    logp = np.full((4, len(vocab)), -10.0)
    labels = np.asarray([1, 2, 3, 4])
    for i, l in enumerate(labels):
        logp[i, l] = 0.0
    acc = sentence_eval.evaluate_sentences(
        logp, labels, sentence_start_idx=[0, 2], vocab_list=vocab, scorer=scorer
    )
    assert acc == 1.0


def test_evaluate_sentences_wrong_classifier():
    vocab = ["[UNK]", "HELLO", "WORLD"]
    scorer = sentence_eval.NgramScorer().fit(["hello world"])
    logp = np.full((2, 3), -10.0)
    logp[:, 0] = 0.0  # classifier always says UNK, truth not in top-1...
    labels = np.asarray([1, 2])
    # ...but with word_top_k=1 the truth can't appear in any beam
    acc = sentence_eval.evaluate_sentences(
        logp, labels, [0], vocab, scorer, word_top_k=1
    )
    assert acc == 0.0
