"""Multimodal plumbing: stubbed decode, real Ray-side schema/actor path."""

import pandas as pd
import pytest

import ray.data

from dygiepp_ray.stages.multimodal import (
    DEFAULT_MEDIA_BATCH_SIZE,
    FrameSampler,
    ImageDecoder,
    MEDIA_SCHEMA,
    synth_media_table,
)


def test_media_table_schema():
    t = synth_media_table(12)
    assert t.schema.equals(MEDIA_SCHEMA)
    assert t.num_rows == 12


def test_real_decode_is_marked_unimplemented():
    with pytest.raises(NotImplementedError):
        ImageDecoder(fake=False)


def test_fake_decoder_deterministic():
    t = synth_media_table(6)
    df = t.to_pandas()
    d = ImageDecoder(feature_dim=8)
    f1 = d(df)["feature"].tolist()
    f2 = ImageDecoder(feature_dim=8)(df)["feature"].tolist()
    assert f1 == f2
    assert all(len(f) == 8 for f in f1)


def test_actor_pool_pipeline():
    ds = ray.data.from_arrow(synth_media_table(16))
    out = ds.map_batches(
        ImageDecoder, fn_constructor_kwargs=dict(feature_dim=4),
        batch_format="pandas", batch_size=DEFAULT_MEDIA_BATCH_SIZE, concurrency=1,
    ).to_pandas()
    assert len(out) == 16 and all(len(f) == 4 for f in out["feature"])


def test_frame_sampler_offsets():
    fs = FrameSampler(n_frames=4)
    df = pd.DataFrame({"media_id": ["v1"], "duration_ms": [1000]})
    out = fs(df)
    assert out["frame_offset_ms"].tolist() == [0, 250, 500, 750]
