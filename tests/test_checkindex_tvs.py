"""CheckIndex term-vectors section (tools/check_index.py): green on a
healthy stored-TV index, loud on tf / positions corruption."""

import glob
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tv_index(ray_session):
    from lucene_solr_ray.functions.fulltext import docs_index

    return docs_index("/root/testdata/sf0.001")


def _check(index_dir):
    from tools.check_index import check_index

    return check_index(index_dir)


def test_healthy_tv_index_ok(tv_index):
    assert _check(tv_index) == []


@pytest.mark.parametrize("corrupt", ["tf", "positions"])
def test_tv_corruption_detected(tv_index, tmp_path, corrupt):
    dst = str(tmp_path / "corrupt")
    shutil.copytree(tv_index, dst)
    f = sorted(glob.glob(dst + "/tvs/*.parquet"))[0]
    t = pq.read_table(f)
    if corrupt == "tf":
        v = t.column("tf").to_pylist()
        v[0] += 1
        t = t.set_column(t.schema.get_field_index("tf"), "tf",
                         pa.array(v, t.schema.field("tf").type))
    else:
        v = t.column("positions").to_pylist()
        for i, p in enumerate(v):
            if len(p) > 1:
                v[i] = list(reversed(p))
                break
        t = t.set_column(t.schema.get_field_index("positions"), "positions",
                         pa.array(v, t.schema.field("positions").type))
    pq.write_table(t, f)
    probs = [p for p in _check(dst) if "tvs" in p]
    assert probs, f"{corrupt} corruption not detected"
