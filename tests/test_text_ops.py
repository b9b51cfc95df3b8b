"""Text analysis stages: stats/quality, langid, fingerprinting, and the
multimodal binary-column plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from engine.fingerprint import fingerprint64, fingerprint_stage, rolling_hashes, winnow
from engine.langid import LangId, lang_id
from engine.multimodal import ImageDecoder, decode_html, decode_images, html_to_text_batch
from engine.textstats import TextStats, text_stats


# --- textstats -------------------------------------------------------------

def test_textstats_counts():
    st = TextStats()
    df = st(pd.DataFrame({"text": ["the cat sat on the mat!", "", None, "a b-c 12.5"]}))
    assert df.n_tokens.tolist() == [6, 0, 0, 3]
    assert df.n_chars.tolist() == [23, 0, 0, 10]
    # words: the|cat|sat|on|the|mat|! -> 7 ; a|b|-|c|12|.|5 -> 7
    assert df.n_words.tolist() == [7, 0, 0, 7]
    assert df.loc[0, "stop_ratio"] == pytest.approx(3 / 6)  # 'the' x2 + 'on'
    assert df.loc[1, "alpha_ratio"] == 0.0
    assert ((df.quality >= 0) & (df.quality <= 1)).all()


def test_textstats_stage_runs(ray_session, sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = text_stats(ds).to_pandas()
    assert {"n_tokens", "alpha_ratio", "quality"} <= set(out.columns)
    assert len(out) == 500
    assert (out.n_tokens > 0).all()


# --- langid ----------------------------------------------------------------

def test_langid_obvious_cases():
    li = LangId()
    assert li.classify("the cat is on the mat and it is warm")[0] == "en"
    assert li.classify("el gato está en la casa y no se mueve de la silla")[0] == "es"
    assert li.classify("der Hund ist in dem Haus und die Katze auf dem Dach")[0] == "de"
    assert li.classify("这是一个中文句子，用来测试语言识别。")[0] == "zh"
    assert li.classify("Это русский текст для проверки")[0] == "ru"
    assert li.classify("")[0] == "und"
    assert li.classify("12345 67890 !!!")[0] == "und"


def test_langid_stage_deterministic(ray_session, sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    a = lang_id(ds).to_pandas().sort_values("doc_id").lang_pred.tolist()
    b = lang_id(ds).to_pandas().sort_values("doc_id").lang_pred.tolist()
    assert a == b


# --- fingerprinting --------------------------------------------------------

def test_rolling_hashes_shift_invariant():
    h1 = rolling_hashes("abcdefgh", 3)
    h2 = rolling_hashes("xxabcdefgh", 3)
    # shared grams hash identically regardless of position
    assert set(h1).issubset(set(h2))
    assert len(h1) == len("abcdefgh") - 2


def test_winnow_selects_window_minima():
    h = np.array([9, 3, 7, 5, 1, 8, 2], dtype=np.uint64)
    fp = winnow(h, w=3)
    # windows: [9,3,7]->3 [3,7,5]->3 [7,5,1]->1 [5,1,8]->1 [1,8,2]->1
    assert set(fp.tolist()) == {3, 1}


def test_fingerprint64_robust_and_sensitive():
    base = "the quick brown fox jumps over the lazy dog " * 4
    assert fingerprint64(base) == fingerprint64(base)
    assert fingerprint64(base) != fingerprint64(base.replace("quick", "slow"))
    assert fingerprint64("") == 0


def test_fingerprint_stage(ray_session, sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = fingerprint_stage(ds).to_pandas()
    assert len(out) == 500 and out.fingerprint.nunique() > 490


# --- multimodal plumbing ---------------------------------------------------

def test_html_to_text_strips_and_quarantines():
    t = pa.table(
        {
            "html": pa.array(
                [b"<html><body>Hello &amp; <b>world</b></body></html>", b"\xff\xfe bad", None],
                pa.binary(),
            )
        }
    )
    out = html_to_text_batch(t)
    assert out.column("extracted_text").to_pylist() == ["Hello & world", None, None]
    errs = out.column("decode_error").to_pylist()
    assert errs[0] is None and errs[1] and errs[2] == "null payload"


def test_decode_html_on_pages(ray_session, sf_dir):
    from engine.pages import read_pages

    out = decode_html(read_pages(sf_dir)).to_pandas()
    ok = out[out.decode_error.isna()]
    # pages html wraps text: extraction round-trips the text column
    assert (ok.extracted_text == ok.text.str.replace(r"\s+", " ", regex=True).str.strip()).all()


def test_image_decoder_fake_and_stub(ray_session):
    t = pa.table({"image": pa.array([b"png1", b"png2"], pa.binary())})
    out = decode_images(ray.data.from_arrow(t), fake=True).to_pandas()
    assert {"width", "height", "channels", "feat_mean"} <= set(out.columns)
    assert (out.width >= 16).all()
    # deterministic fake
    again = decode_images(ray.data.from_arrow(t), fake=True).to_pandas()
    assert out.width.tolist() == again.width.tolist()
    # real mode is an explicit stub
    with pytest.raises(NotImplementedError):
        ImageDecoder(fake=False)._decode_one(b"x")


def test_video_sampler_fake_and_stub(ray_session):
    from engine.multimodal import VideoFrameSampler

    t = pa.table({"video": pa.array([b"mp4-1", b"mp4-2"], pa.binary())})
    out = ray.data.from_arrow(t).map_batches(
        VideoFrameSampler, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"fake": True},
    ).to_pandas()
    assert {"n_frames_total", "sampled_frames", "fps"} <= set(out.columns)
    assert all(f in (24, 25, 30, 60) for f in out.fps)
    with pytest.raises(NotImplementedError):
        VideoFrameSampler()(t)
