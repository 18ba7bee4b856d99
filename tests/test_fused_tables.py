"""fused_table_crops parity: the flagship's one-pass layout→table-crop
fusion must emit exactly what the relational chain
table_crops(layout_stage_tiled(pages), pages) emits — crop bytes
included — across the tiled (tall/wide), small-page, relabel→Table,
and no-table paths."""

from __future__ import annotations

from surya_spark import datagen
from surya_spark.operators import layout, slots, tables


def _page(ref, w, h, regions, table=None):
    desc = {"w": w, "h": h, "lines": [], "table": table,
            "regions": regions}
    return (ref, w, h, datagen.encode_page(desc))


def _rows(df):
    return sorted(
        (r["media_ref"], r["table_idx"], r["x1"], r["y1"], r["x2"],
         r["y2"], bytes(r["crop_bytes"]))
        for r in df.collect()
    )


def test_fused_table_crops_byte_identical_to_relational(spark):
    table_desc = {"x": 120.0, "y": 150.0, "cell_w": 80.0, "cell_h": 30.0,
                  "rows": 3, "cols": 4}
    pages = spark.createDataFrame(
        [
            # tall page: split into ≥3 tiles; the Table crosses a tile
            # boundary → exercises tile_sub_blob clipping + merge-union
            _page("blob://f/tall", 1024, 4096, [
                {"label": "SectionHeader", "bbox": [60, 28, 600, 60],
                 "order": 0},
                {"label": "Table", "bbox": [100, 900, 900, 1600],
                 "order": 1},
                {"label": "Text", "bbox": [60, 1700, 964, 3900],
                 "order": 2},
            ], table_desc),
            # wide page: width-split path
            _page("blob://f/wide", 4096, 1024, [
                {"label": "Table", "bbox": [100, 100, 3900, 900],
                 "order": 0},
            ], table_desc),
            # small page: two tables → table_idx ordering by (y1, x1)
            _page("blob://f/two", 1024, 1024, [
                {"label": "Table", "bbox": [60, 500, 500, 900],
                 "order": 0},
                {"label": "Table", "bbox": [60, 100, 500, 400],
                 "order": 1},
                {"label": "Text", "bbox": [550, 100, 964, 900],
                 "order": 2},
            ], table_desc),
            # relabel page: PageHeader centered mid-page takes its
            # second-best top_k label (= Table with the fixed slot) —
            # the fused filter must see the RELABELED label
            _page("blob://f/relabel", 1024, 1024, [
                {"label": "PageHeader", "bbox": [100, 480, 900, 540],
                 "order": 0},
                {"label": "PageFooter", "bbox": [100, 980, 900, 1010],
                 "order": 1},
            ], table_desc),
            # no tables at all → zero rows for this page
            _page("blob://f/none", 1024, 1024, [
                {"label": "Text", "bbox": [60, 100, 964, 900],
                 "order": 0},
            ]),
        ],
        "media_ref string, width int, height int, img_bytes binary",
    )

    # nested so cloudpickle serializes by value (test modules aren't
    # importable on executors)
    def fixed_slot(media_ref, width, height, img_bytes):
        desc = datagen.decode_page(img_bytes)
        out = []
        for r in sorted(desc.get("regions", []), key=lambda r: r["order"]):
            x1, y1, x2, y2 = (float(v) for v in r["bbox"])
            out.append({
                "emit_idx": r["order"], "label": r["label"],
                "x1": x1, "y1": y1, "x2": x2, "y2": y2,
                "confidence": 0.9,
                "top_k": {r["label"]: 0.6, "Table": 0.25, "Caption": 0.1},
            })
        return out

    for slot in (slots.surrogate_layout, fixed_slot):
        relational = _rows(tables.table_crops(
            layout.layout_stage_tiled(pages, slot), pages))
        fused = _rows(tables.fused_table_crops(pages, slot))
        assert fused == relational, getattr(slot, "__name__", slot)
        assert len(fused) > 0

    # the relabel page really did contribute a table via its second-best
    # label (only under the fixed slot, whose top_k pins Table second)
    fused_fixed = _rows(tables.fused_table_crops(pages, fixed_slot))
    assert any(m == "blob://f/relabel" for m, *_ in fused_fixed)
    # and the no-table page contributed nothing
    assert all(m != "blob://f/none" for m, *_ in fused_fixed)
