"""mzML (mass-spectrometry XML) source.

Parity: reference ``read_mzml`` (golden: id='declaration=0 collection=0
scan=0', intensity STRUCT(intensity LIST(FLOAT)), wavelength
STRUCT(wavelength LIST(FLOAT)), test_mzml_scan.test:6-10).

Stdlib ElementTree streaming parse (iterparse) per file split; binary data
arrays are base64 little-endian float32/64, optionally zlib-compressed, per
the PSI mzML spec's cvParam accessions.
"""

from __future__ import annotations

import base64
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from exon_duckdb_spark.sources.reader_core import make_reader
from exon_duckdb_spark.sources.schemas import MZML_SCHEMA
from exon_duckdb_spark.sources.splits import FileSplit, open_maybe_compressed

__all__ = ["read_mzml"]

_ACC_F64 = "MS:1000523"
_ACC_F32 = "MS:1000521"
_ACC_ZLIB = "MS:1000574"
_ACC_MZ = "MS:1000514"
_ACC_INTENSITY = "MS:1000515"
_ACC_WAVELENGTH = "MS:1000617"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _decode_array(accs: set[str], text: str) -> list[float]:
    raw = base64.b64decode(text or "")
    if _ACC_ZLIB in accs:
        raw = zlib.decompress(raw)
    fmt = "d" if _ACC_F64 in accs else "f"
    n = len(raw) // struct.calcsize(fmt)
    return list(struct.unpack(f"<{n}{fmt}", raw))


def _parse_mzml_split(split: FileSplit) -> Iterator[dict]:
    import xml.etree.ElementTree as ET

    with open_maybe_compressed(split.path, split.compression) as f:
        for _, elem in ET.iterparse(f, events=("end",)):
            if _local(elem.tag) != "spectrum":
                # release completed chromatograms too — their base64
                # payloads otherwise accumulate until EOF even though only
                # spectra are yielded. (Do NOT clear 'binary' here: inner
                # end-events fire BEFORE the enclosing spectrum's, and the
                # spectrum decode still needs those payloads.)
                if _local(elem.tag) == "chromatogram":
                    elem.clear()
                continue
            spec_id = elem.get("id")
            # spectrum-level cvParams: DIRECT children only (the ones inside
            # binaryDataArray describe encodings, not the spectrum)
            cv_params = [
                {
                    "accession": cv.get("accession"),
                    "name": cv.get("name"),
                    "value": cv.get("value"),
                }
                for cv in elem
                if _local(cv.tag) == "cvParam"
            ]
            mz = intensity = wavelength = None
            for bda in elem.iter():
                if _local(bda.tag) != "binaryDataArray":
                    continue
                accs = {
                    cv.get("accession")
                    for cv in bda
                    if _local(cv.tag) == "cvParam"
                }
                btext = None
                for child in bda:
                    if _local(child.tag) == "binary":
                        btext = child.text
                values = _decode_array(accs, btext) if btext else []
                if _ACC_MZ in accs:
                    mz = values
                elif _ACC_INTENSITY in accs:
                    intensity = values
                elif _ACC_WAVELENGTH in accs:
                    wavelength = values
            yield {
                "id": spec_id,
                "cv_params": cv_params,
                "mz": {"mz": mz} if mz is not None else None,
                "intensity": {"intensity": intensity} if intensity is not None else None,
                "wavelength": {"wavelength": wavelength} if wavelength is not None else None,
            }
            elem.clear()


def read_mzml(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """mzML spectra as DataFrame[id, mz, intensity, wavelength]."""
    return make_reader(
        spark,
        path,
        MZML_SCHEMA,
        _parse_mzml_split,
        compression="auto_detect",
        splittable=False,
    )
