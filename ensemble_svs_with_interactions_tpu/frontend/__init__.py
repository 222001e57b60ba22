from ensemble_svs_with_interactions_tpu.frontend import ja, merlin, zh  # noqa: F401


def load_score(filename, content):
    """Dispatch a score upload to full-context labels by filename suffix.

    ``content`` may be bytes or text; .xml/.musicxml goes through the
    MusicXML frontend, .ust through the UST frontend, anything else is
    parsed as HTS full-context labels.  Shared by the demo apps and the
    NEUTRINO server (reference surface: streamlit_demo/app.py:26 uploads
    MusicXML; neutrino_compat/server.py:134-171 uploads MusicXML/UST)."""
    name = str(filename).lower()
    if isinstance(content, bytes):
        if name.endswith(".ust"):  # USTs are conventionally Shift-JIS
            for enc in ("utf-8-sig", "cp932", "utf-8"):
                try:
                    content = content.decode(enc)
                    break
                except UnicodeDecodeError:
                    continue
            else:
                content = content.decode("utf-8", errors="replace")
        else:
            content = content.decode("utf-8")
    if name.endswith((".xml", ".musicxml")):
        import io as _io

        from ensemble_svs_with_interactions_tpu.frontend.musicxml import (
            parse_musicxml,
            score_to_labels,
        )

        return score_to_labels(parse_musicxml(_io.StringIO(content)))
    if name.endswith(".ust"):
        from ensemble_svs_with_interactions_tpu.frontend.ust import (
            ust_to_labels,
        )

        return ust_to_labels(content)
    from ensemble_svs_with_interactions_tpu.io import hts

    return hts.loads(content)
