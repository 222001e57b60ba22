"""Streamlit demo: upload labels, synthesize, play.

Equivalent of /root/reference/streamlit_demo/app.py:10-37 (there: MusicXML
via the native sinsy frontend; here: HTS labels, MusicXML via the
first-party frontend, or UST).  Requires streamlit (not bundled in this
environment):

    streamlit run ensemble_svs_with_interactions_tpu/demo/streamlit_app.py
"""

from __future__ import annotations

import io

import numpy as np

try:
    import streamlit as st
except ImportError as e:  # pragma: no cover - demo-only dependency
    raise SystemExit(
        "streamlit is required for the demo: pip install streamlit"
    ) from e

from ensemble_svs_with_interactions_tpu.frontend import load_score
from ensemble_svs_with_interactions_tpu.pretrained import (
    create_svs_engine,
    model_registry,
)


@st.cache_resource
def _engine(name: str):
    return create_svs_engine(name)


def main():
    st.title("TPU-native ensemble SVS demo")
    model_name = st.selectbox(
        "Model", sorted(model_registry) or ["<register models first>"]
    )
    uploaded = st.file_uploader(
        "Score file", type=["lab", "xml", "musicxml", "ust"]
    )
    vocoder = st.selectbox("Vocoder", ["world", "usfgan"])
    if uploaded is not None and model_name in model_registry:
        labels = load_score(uploaded.name, uploaded.read())
        engine = _engine(model_name)
        with st.spinner("Synthesizing..."):
            wav, sr = engine.svs(labels, vocoder_type=vocoder)
        buf = io.BytesIO()
        from scipy.io import wavfile

        wavfile.write(buf, sr, wav)
        st.audio(buf.getvalue(), format="audio/wav")
        st.caption(f"RTF {engine.last_rtf:.3f} @ {sr} Hz")


if __name__ == "__main__":
    main()
