"""Browser demo: upload an HTS label file, synthesize, play the audio.

Equivalent of the reference's Streamlit demo (streamlit_demo/app.py:10-37,
which uploads MusicXML, runs pysinsy and `svs()`).  Accepts ``.lab``
(canonical input), ``.xml/.musicxml`` (first-party pysinsy replacement)
and ``.ust`` (UTAU) uploads via ``frontend.load_score``.

Runs under Streamlit when available; in environments without it, use the
NEUTRINO-compatible HTTP server instead:

    python -m ensemble_svs_with_interactions_tpu.bin.neutrino_server \
        --model-dir <packed_model_dir> --port 8080

Usage (with streamlit): streamlit run demo/app.py -- <packed_model_dir>
"""

from __future__ import annotations

import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(model_dir: str):
    import numpy as np
    import streamlit as st
    from scipy.io import wavfile

    from ensemble_svs_with_interactions_tpu.frontend import load_score
    from ensemble_svs_with_interactions_tpu.svs import SPSVS

    st.title("Ensemble SVS (TPU) demo")

    @st.cache_resource
    def load_engine(path):
        return SPSVS(path)

    engine = load_engine(model_dir)
    uploaded = st.file_uploader(
        "Score: HTS labels (.lab), MusicXML (.xml/.musicxml) or UST (.ust)"
    )
    if uploaded is not None:
        labels = load_score(uploaded.name, uploaded.read())
        with st.spinner("Synthesizing..."):
            wav, sr = engine.svs(labels)
        buf = io.BytesIO()
        wavfile.write(buf, sr, np.asarray(wav))
        st.audio(buf.getvalue(), format="audio/wav")


if __name__ == "__main__":
    try:
        import streamlit  # noqa: F401
    except ImportError:
        raise SystemExit(
            "streamlit is not installed in this environment; use the HTTP "
            "demo instead:\n  python -m "
            "ensemble_svs_with_interactions_tpu.bin.neutrino_server "
            "--model-dir <packed_model_dir> --port 8080"
        )
    main(sys.argv[1] if len(sys.argv) > 1 else "packed_model")
