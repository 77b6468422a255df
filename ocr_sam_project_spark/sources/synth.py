"""Deterministic synthetic Common-Crawl-style pages generator.

Per BASELINE.json input_hint the pipeline's only external input is a table
of pages (url, warc_ts, html binary, text, lang).  No such table ships in
/root/testdata, so (per the north rule) we synthesise it deterministically:
seed=42, zero wall-clock, byte-stable across runs and machines.

Each generated page also carries its *golden* extraction: the exact main
content block texts the generator embedded.  The expected extracted_text is
derived from the construction, NOT by running the extractor — so the golden
fixture test is not circular.

Content mix (FIXTURES.md §1):
* one+ page per each of the 16 doc types (keywords planted);
* person tables in the three documented layouts (ocr_service.py:331-335)
  incl. the verbatim MINI SUPER AYACUCHO worked example (ocr_service.py:349-366);
* ~10% PDF-style multi-page docs with separator pages (pdf_service.py:79-93)
  and first-page config/metadata headers (metadata_service.py:56-87);
* Zipfian domain skew (a few hot domains + long tail) to exercise salting;
* non-Spanish pages (classify to unknown), empty pages, binary garbage.
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from ..extraction.classifier import TAXONOMY

EPOCH = datetime(2025, 1, 1)

TYPE_PHRASES: dict[str, str] = {
    "secuestro_civil": "se decreta el secuestro civil de los bienes descritos",
    "aprehension": "se ordena la aprehensión inmediata de los fondos señalados",
    "traslado_fondos": "se solicita el traslado de fondos aprehendidos a la cuenta oficial",
    "levantamiento": "se ordena el levantamiento de la medida cautelar impuesta",
    "embargo": "se decreta formal embargo sobre las cuentas del demandado",
    "adjudicacion_sucesion": "se declara la adjudicación de los bienes a favor de los herederos",
    "investigacion_sucesion": "dentro del proceso de sucesión se requiere informe de cuentas",
    "solo_notificacion": "la presente es de solo notificación para los efectos legales",
    "citacion": "se cita a comparecer ante este despacho mediante citación formal",
    "investigacion_civil": "en la investigación civil que se adelanta se solicita información",
    "investigacion_familia": "en la investigación de familia en curso se requiere certificación",
    "investigacion_penal": "dentro de la investigación penal se ordena remitir los registros",
    "informacion_clientes": "se emite solicitud de información de clientes de esa entidad",
    "inspeccion_ocular": "se practicará inspección ocular en las oficinas indicadas",
    "allanamiento": "se autoriza el allanamiento del inmueble descrito",
    "diligencia_exhibitoria": "se decreta diligencia exhibitoria de los libros contables",
}

FIRST_NAMES = ["MARIA", "JOSE", "ANA", "LUIS", "CARMEN", "PEDRO", "ROSA", "JUAN",
               "LUCIA", "CARLOS", "ELENA", "MIGUEL"]
LAST_NAMES = ["GONZALEZ", "RODRIGUEZ", "MARTINEZ", "PEREZ", "SANCHEZ", "RAMIREZ",
              "TORRES", "FLORES", "DIAZ", "MORALES", "CASTILLO", "ORTEGA"]
COMPANIES = ["MINI SUPER EL SOL", "DISTRIBUIDORA CENTRAL", "COMERCIAL LA ESTRELLA",
             "IMPORTADORA DEL ISTMO", "PANADERIA LA ESPIGA", "FERRETERIA EL MARTILLO"]

MESES_ES = ["enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
            "agosto", "septiembre", "octubre", "noviembre", "diciembre"]

# Zipf-ish domain pool: weight ~ 1/rank — a few mega-domains + long tail.
HOT_DOMAINS = ["organojudicial.gob.pa", "gacetaoficial.gob.pa", "mingob.gob.pa"]

TABLE_HEADERS = [
    "N° Exp. | Agente Económico | R.U.C. | Monto B/.",
    "Empleador | N° de empleador | RUC/C.I.P. | Monto B/.",
    "Nombre | Cédula | Cuenta | Monto B/.",
]


@dataclass
class Page:
    url: str
    warc_ts: datetime
    html: bytes
    text: str
    lang: str
    # golden: expected (seg_no, extracted_text) pairs; empty for quarantine rows
    golden: list[tuple[int, str]] = field(default_factory=list)


# --------------------------------------------------------------------------
def _domain(rng: random.Random, i: int, n: int) -> str:
    # ~45% of traffic on 3 hot domains, rest long-tail
    r = rng.random()
    if r < 0.25:
        return HOT_DOMAINS[0]
    if r < 0.37:
        return HOT_DOMAINS[1]
    if r < 0.45:
        return HOT_DOMAINS[2]
    return f"site{rng.randrange(max(10, n // 20))}.example.com"


def _person_row(rng: random.Random, layout: int) -> tuple[str, float]:
    """One table-row line in the given layout; returns (line, amount)."""
    if rng.random() < 0.3:
        name = rng.choice(COMPANIES) + "/" + rng.choice(FIRST_NAMES) + " " + rng.choice(LAST_NAMES)
    else:
        k = rng.choice([2, 3, 4, 5])
        parts = [rng.choice(FIRST_NAMES)] + [rng.choice(LAST_NAMES) for _ in range(k - 1)]
        name = " ".join(parts)
    ced = f"{rng.randrange(1, 13)}-{rng.randrange(100, 999)}-{rng.randrange(1000, 9999)}"
    amount = round(rng.uniform(50, 120000), 2)
    amt_str = f"{amount:,.2f}"
    exp = f"{rng.randrange(100, 999)}-2025"
    if layout == 0:
        line = f"{exp} | {name} | {ced}, D.V. {rng.randrange(10, 99)} | {amt_str}"
    elif layout == 1:
        line = f"{name} | {ced} | {amt_str}"
    else:
        line = f"{name} | {ced} | CTA {rng.randrange(10**8, 10**9)} | {amt_str}"
    return line, amount


def _main_blocks(rng: random.Random, tipo: str, i: int) -> list[str]:
    """The main-content block texts (the golden extracted_text pieces)."""
    dt = next(t for t in TAXONOMY if t.tipo == tipo)
    num = f"JE-{1000 + (i % 9000)}-2025"
    dia = 1 + (i % 28)
    mes = MESES_ES[i % 12]
    juz = rng.choice(["Primero", "Segundo", "Tercero", "Cuarto"])
    ramo = "Civil" if dt.departamento == "Civil" else "Penal"
    blocks = [
        f"REPUBLICA DE PANAMA ORGANO JUDICIAL Oficio No. {num}",
        f"Juzgado {juz} de lo {ramo} del Primer Circuito Judicial",
        f"Panamá, {dia} de {mes} de 2025",
        f"Señores Banco Nacional: {TYPE_PHRASES[tipo]}, expediente {rng.randrange(100, 999)}-2025.",
    ]
    if rng.random() < 0.6:
        layout = rng.randrange(3)
        blocks.append(TABLE_HEADERS[layout])
        rows = 1 + rng.randrange(4)
        for _ in range(rows):
            line, _amt = _person_row(rng, layout)
            blocks.append(line)
    if i % 37 == 0:
        # the verbatim worked example (ocr_service.py:349-366)
        blocks.append(TABLE_HEADERS[0])
        blocks.append("146-2025 | MINI SUPER AYACUCHO/RICARDO QIU ZHANG | 8-947-865, D.V. 86 | 467.50")
    blocks.append(f"Atentamente, El Juez {rng.choice(LAST_NAMES).title()}. Tel: {rng.randrange(200, 999)}-{rng.randrange(1000, 9999)}")
    return blocks


def _boilerplate_html(rng: random.Random, main_blocks: list[str]) -> str:
    """Wrap main blocks in a boilerplate shell: blacklisted containers plus a
    link-dense div that must be rejected by density scoring alone."""
    nav = "".join(f'<a href="/s{k}">Sección {k}</a> ' for k in range(6))
    linky = " ".join(f'<a href="/r{k}">enlace relacionado {k}</a>' for k in range(5))
    main = "\n".join(f"      <p>{b}</p>" for b in main_blocks)
    return f"""<!DOCTYPE html>
<html lang="es">
<head><title>Notificaciones</title><script>var x=1;</script>
<style>p{{margin:0}}</style></head>
<body>
  <header><h1>Portal de Notificaciones Judiciales</h1>{nav}</header>
  <nav><ul><li><a href="/inicio">Inicio</a></li><li><a href="/oficios">Oficios</a></li></ul></nav>
  <div class="related">Vea también: {linky}</div>
  <article>
{main}
  </article>
  <aside><h3>Publicidad</h3><a href="/ad1">Anuncio uno</a> <a href="/ad2">Anuncio dos</a></aside>
  <footer>© 2025 Portal Judicial — <a href="/terminos">Términos</a> <a href="/privacidad">Privacidad</a></footer>
</body>
</html>"""


def _pdf_pages(rng: random.Random, i: int, n_docs: int) -> tuple[list[str], list[tuple[int, str]]]:
    """Multi-oficio PDF text layer: config page + per-doc pages with
    separator pages between docs.  Returns (pages, golden segments)."""
    empresa = rng.choice(COMPANIES).title()
    config = (
        f"empresa: {empresa}\n"
        f"cantidad_oficios: {n_docs}\n"
        f"origen: Panamá\n"
        f"observaciones: lote sintético {i}\n"
        f"fecha: {1 + i % 28}/0{1 + i % 9}/2025\n"
        f"operador: Operador {rng.randrange(1, 9)}"
    )
    pages: list[str] = [config]
    golden: list[tuple[int, str]] = []
    tipos = [TAXONOMY[rng.randrange(len(TAXONOMY))].tipo for _ in range(n_docs)]
    # config page is part of segment 1 under separator-split semantics
    # (pdf_service.py:106-147: pages before the first separator form doc 1).
    seg_pages: list[list[str]] = []
    first = _main_blocks(rng, tipos[0], i)
    seg_pages.append([config, "\n".join(first)])
    for d in range(1, n_docs):
        blocks = _main_blocks(rng, tipos[d], i + d)
        seg_pages.append(["\n".join(blocks)])
    for s, sp in enumerate(seg_pages):
        if s > 0:
            pages.append("SEPARADOR DE OFICIOS\n=====================")
        if s == 0:
            pages = [sp[0], sp[1]] if len(sp) > 1 else [sp[0]]
        else:
            pages.extend(sp)
    # golden: normalized page texts joined by '\n' per segment
    for s, sp in enumerate(seg_pages):
        norm = "\n".join(" ".join(p.split()) for p in sp if p.strip())
        golden.append((s + 1, norm))
    return pages, golden


def _pdf_literal(line: str) -> bytes:
    esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    return b"(" + esc.encode("latin-1") + b")"


def real_pdf_bytes(pages: list[str]) -> bytes | None:
    """Deterministic minimal REAL PDF carrying `pages` as its text layer
    (classic catalog -> /Pages -> /Kids tree, one content stream per page;
    even-numbered pages FlateDecode, odd raw — both decoder paths covered).
    Returns None when a character falls outside latin-1 (caller keeps the
    fake marker bytes for that row)."""
    try:
        objs: list[tuple[int, bytes]] = []
        kid_refs = []
        next_num = 3
        for p_idx, page in enumerate(pages):
            page_num, cont_num = next_num, next_num + 1
            next_num += 2
            kid_refs.append(f"{page_num} 0 R".encode())
            ops = b"BT /F1 12 Tf "
            for j, line in enumerate(page.split("\n")):
                if j > 0:
                    ops += b"0 -14 Td "
                ops += _pdf_literal(line) + b" Tj "
            raw = ops + b"ET"
            if p_idx % 2 == 0:
                data, filt = zlib.compress(raw), b" /Filter /FlateDecode"
            else:
                data, filt = raw, b""
            objs.append(
                (page_num, b"<< /Type /Page /Parent 2 0 R /Contents "
                 + f"{cont_num} 0 R".encode() + b" >>")
            )
            objs.append(
                (cont_num, b"<< /Length " + str(len(data)).encode() + filt
                 + b" >>\nstream\n" + data + b"\nendstream")
            )
        head = [
            (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
            (2, b"<< /Type /Pages /Kids [" + b" ".join(kid_refs)
             + b"] /Count " + str(len(pages)).encode() + b" >>"),
        ]
        out = b"%PDF-1.4\n"
        for num, payload in head + objs:
            out += f"{num} 0 obj\n".encode() + payload + b"\nendobj\n"
        return out + b"%%EOF\n"
    except UnicodeEncodeError:
        return None


def make_pages(n: int, seed: int = 42) -> list[Page]:
    """Generate n deterministic pages (seed fixed -> byte-stable)."""
    rng = random.Random(seed)
    out: list[Page] = []
    for i in range(n):
        ts = EPOCH + timedelta(seconds=i * 137)
        dom = _domain(rng, i, n)
        url = f"https://{dom}/oficios/{i:08d}"
        r = rng.random()
        if r < 0.02:
            # quarantine rows: binary garbage / empty
            if rng.random() < 0.5:
                out.append(Page(url, ts, bytes([rng.randrange(256) for _ in range(64)]), "", "es", []))
            else:
                out.append(Page(url, ts, b"", "", "es", []))
            continue
        if r < 0.07:
            # non-Spanish page -> classifies unknown, but text still extracted
            blocks = [f"Public notice number {i}", "This page is not a Panamanian oficio.",
                      "It exists to exercise the language gate."]
            html = _boilerplate_html(rng, blocks)
            out.append(Page(url, ts, html.encode("utf-8"), " ".join(blocks), "en",
                            [(1, "\n".join(blocks))]))
            continue
        if r < 0.17:
            # PDF path: multi-doc with separators (~10%).  Even indexes get
            # REAL minimal PDF bytes (parsed by extraction.pdftext); odd keep
            # the fake marker + text layer (the fallback path).  Index-based
            # choice keeps the rng stream — and thus every other row —
            # byte-stable across generator versions.
            n_docs = 2 + rng.randrange(3)
            pages, golden = _pdf_pages(rng, i, n_docs)
            text = "\f".join(pages)
            html = b"%PDF-1.4 synthetic-text-layer"
            if i % 2 == 0:
                real = real_pdf_bytes(pages)
                if real is not None:
                    html = real
            out.append(Page(url, ts, html, text, "es", golden))
            continue
        # HTML path (dominant)
        tipo = TAXONOMY[i % len(TAXONOMY)].tipo
        blocks = _main_blocks(rng, tipo, i)
        html = _boilerplate_html(rng, blocks)
        out.append(Page(url, ts, html.encode("utf-8"), " ".join(blocks), "es",
                        [(1, "\n".join(blocks))]))
    return out


def pages_rows(n: int, seed: int = 42) -> list[dict]:
    """Pages as plain dicts (url, warc_ts, html, text, lang) for Spark/Arrow."""
    return [
        {"url": p.url, "warc_ts": p.warc_ts, "html": p.html, "text": p.text, "lang": p.lang}
        for p in make_pages(n, seed)
    ]


def golden_rows(n: int, seed: int = 42) -> list[dict]:
    """Golden (url, seg_no, extracted_text) rows for the fixture diff."""
    out = []
    for p in make_pages(n, seed):
        for seg_no, txt in p.golden:
            out.append({"url": p.url, "seg_no": seg_no, "extracted_text": txt})
    return out
