"""MemexQA v1.1 raw-data schema: `qas.json` + `album_info.json` parsing and validation.

Field names follow the MemexQA dataset release as documented in SURVEY.md section 2
("Dataset schema details"): the reference mount was empty, so unknown/renamed fields are
handled defensively — every accessor tolerates missing optional fields and the parser
reports exactly which records were dropped and why.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Iterable


@dataclass(frozen=True)
class QAPair:
    question_id: str
    question: str
    answer: str
    choices: tuple[str, ...]          # 4 strings, including the answer
    album_ids: tuple[str, ...]
    flickr_user_id: str = ""
    evidence_photo_ids: tuple[str, ...] = ()

    @property
    def label(self) -> int:
        """Index of the correct answer within `choices`."""
        return self.choices.index(self.answer)


@dataclass(frozen=True)
class Album:
    album_id: str
    title: str = ""
    description: str = ""
    where: str = ""
    when: str = ""
    photo_ids: tuple[str, ...] = ()
    photo_titles: tuple[str, ...] = ()
    photo_urls: tuple[str, ...] = ()
    photo_gps: tuple[tuple[float, float] | None, ...] = ()


def _as_str(x: Any) -> str:
    if x is None:
        return ""
    if isinstance(x, (list, tuple)):
        return " ".join(_as_str(e) for e in x)
    return str(x)


def _as_str_tuple(x: Any) -> tuple[str, ...]:
    if x is None:
        return ()
    if isinstance(x, (list, tuple)):
        return tuple(_as_str(e) for e in x)
    return (str(x),)


def gps_to_text(gps: tuple[float, float] | None) -> str:
    """Render a (lat, lon) pair as tokenizable text, quantized to 0.1 degree.

    The reference encodes "where"/GPS as token strings (SURVEY.md section 2
    "Preprocessing"); quantization keeps the vocab closed.
    """
    if gps is None:
        return ""
    lat, lon = gps
    return f"latitude {lat:.1f} longitude {lon:.1f}"


def parse_qas(raw: Iterable[dict[str, Any]] | str) -> tuple[list[QAPair], list[str]]:
    """Parse qas.json content (path, JSON string, or loaded list) → (QAs, error log)."""
    if isinstance(raw, str):
        if raw.lstrip().startswith("["):
            raw = json.loads(raw)
        else:
            with open(raw) as f:
                raw = json.load(f)
    qas: list[QAPair] = []
    errors: list[str] = []
    for i, r in enumerate(raw):
        try:
            choices = _as_str_tuple(
                r.get("multiple_choices_4") or r.get("multiple_choices") or r.get("choices")
            )
            answer = _as_str(r.get("answer"))
            if len(choices) != 4:
                errors.append(f"qa[{i}]: expected 4 choices, got {len(choices)}")
                continue
            if answer not in choices:
                errors.append(f"qa[{i}] ({r.get('question_id')}): answer not among choices")
                continue
            qas.append(
                QAPair(
                    question_id=_as_str(r.get("question_id", i)),
                    question=_as_str(r.get("question")),
                    answer=answer,
                    choices=choices,
                    album_ids=_as_str_tuple(r.get("album_ids") or r.get("album_id")),
                    flickr_user_id=_as_str(r.get("flickr_user_id")),
                    evidence_photo_ids=_as_str_tuple(r.get("evidence_photo_ids")),
                )
            )
        except (KeyError, TypeError, ValueError) as e:
            errors.append(f"qa[{i}]: {e!r}")
    return qas, errors


def parse_album_info(raw: Iterable[dict[str, Any]] | str) -> tuple[dict[str, Album], list[str]]:
    """Parse album_info.json content → ({album_id: Album}, error log).

    Photos are kept in the JSON's order, which the dataset release stores
    time-ordered; per-photo lists (titles/urls/gps) are aligned and padded/truncated
    to len(photo_ids).
    """
    if isinstance(raw, str):
        if raw.lstrip().startswith("["):
            raw = json.loads(raw)
        else:
            with open(raw) as f:
                raw = json.load(f)
    albums: dict[str, Album] = {}
    errors: list[str] = []
    for i, r in enumerate(raw):
        try:
            album_id = _as_str(r.get("album_id"))
            if not album_id:
                errors.append(f"album[{i}]: missing album_id")
                continue
            photo_ids = _as_str_tuple(r.get("photo_ids"))
            n = len(photo_ids)

            def _aligned(key: str) -> tuple[str, ...]:
                vals = list(_as_str_tuple(r.get(key)))
                vals = vals[:n] + [""] * max(0, n - len(vals))
                return tuple(vals)

            gps_raw = r.get("photo_gps") or []
            gps: list[tuple[float, float] | None] = []
            for g in list(gps_raw)[:n]:
                if (
                    isinstance(g, (list, tuple))
                    and len(g) >= 2
                    and all(isinstance(v, (int, float)) for v in g[:2])
                ):
                    gps.append((float(g[0]), float(g[1])))
                else:
                    gps.append(None)
            gps += [None] * (n - len(gps))

            albums[album_id] = Album(
                album_id=album_id,
                title=_as_str(r.get("album_title")),
                description=_as_str(r.get("album_description")),
                where=_as_str(r.get("album_where")),
                when=_as_str(r.get("album_when")),
                photo_ids=photo_ids,
                photo_titles=_aligned("photo_titles"),
                photo_urls=_aligned("photo_urls"),
                photo_gps=tuple(gps),
            )
        except (KeyError, TypeError, ValueError) as e:
            errors.append(f"album[{i}]: {e!r}")
    return albums, errors


def album_where_text(album: Album) -> str:
    """The 'where' modality text: location string, falling back to quantized GPS."""
    if album.where.strip():
        return album.where
    for g in album.photo_gps:
        if g is not None:
            return gps_to_text(g)
    return ""
