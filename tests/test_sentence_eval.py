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


def test_score_batch_used_by_beam_search():
    """beam_search routes through scorer.score_batch in ONE call per
    expansion level when available (the batching the module docstring
    promises)."""
    calls = []

    class BatchScorer:
        def score_batch(self, sentences):
            calls.append(len(sentences))
            return [float(len(s)) for s in sentences]

        def __call__(self, s):
            raise AssertionError("per-candidate path must not be used")

    out = sentence_eval.beam_search(BatchScorer(), [["A", "BB"], ["C", "DD"]],
                                    beam_width=4, k=2)
    assert calls == [2, 4]   # one batched call per slot level
    assert out[0] == "BB DD"


def _longrange_corpus(n=300, seed=0):
    """Sentences where the FIRST word determines the LAST (distance 3) —
    invisible to a bigram, learnable by the transformer."""
    rng = np.random.default_rng(seed)
    fillers = ["VERY", "QUITE", "RATHER", "SLIGHTLY"]
    pairs = {"ALPHA": "ONE", "BETA": "TWO"}
    corpus = []
    for _ in range(n):
        a = list(pairs)[int(rng.integers(2))]
        f1, f2 = rng.choice(fillers, 2)
        corpus.append(f"{a} {f1} {f2} {pairs[a]}")
    return corpus, pairs, fillers


def test_neural_scorer_beats_ngram_on_long_range():
    """A/B (round-2 verdict #6): the trained word-LM must resolve the
    first-word→last-word dependency that the add-k bigram cannot."""
    corpus, pairs, fillers = _longrange_corpus()
    neural = sentence_eval.NeuralScorer(steps=300, seed=0).fit(corpus)
    ngram = sentence_eval.NgramScorer().fit(corpus)

    def lastword_accuracy(scorer):
        ok = 0
        cases = [("ALPHA", "ONE"), ("BETA", "TWO")] * 4
        for i, (first, want) in enumerate(cases):
            f1, f2 = fillers[i % 4], fillers[(i + 1) % 4]
            good = f"{first} {f1} {f2} {want}"
            bad = f"{first} {f1} {f2} {dict(ALPHA='TWO', BETA='ONE')[first]}"
            sg, sb = sentence_eval._score_all(scorer, [good, bad])
            ok += int(sg > sb)
        return ok / len(cases)

    acc_neural = lastword_accuracy(neural)
    acc_ngram = lastword_accuracy(ngram)
    # the bigram sees identical contexts for both endings → ~chance; the
    # transformer must get (nearly) all of them
    assert acc_neural >= 0.9, f"neural LM failed long-range: {acc_neural}"
    assert acc_neural > acc_ngram, (acc_neural, acc_ngram)


def test_fit_default_scorer_policy():
    corpus, _, _ = _longrange_corpus(n=50)
    assert isinstance(sentence_eval.fit_default_scorer(corpus, seed=0),
                      sentence_eval.NeuralScorer)
    assert isinstance(sentence_eval.fit_default_scorer(corpus[:3], seed=0),
                      sentence_eval.NgramScorer)
