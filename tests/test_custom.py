"""custom::python_codeblock Packages pip path (local wheel, no network)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def sample_df(spark):
    return spark.createDataFrame(
        [("a", 9), ("b", 10), ("c", 11)], "name STRING, empid INT"
    )

def test_python_codeblock_packages_pip_installs_local_wheel(spark, sample_df, tmp_path):
    """The Packages pip path EXECUTES: a hand-built local wheel (zero
    network) is pip-installed into the temp target and the custom
    function imports it — the reference's Packages mechanism
    (getl/blocks/custom/entrypoint.py:200-211) driven for real."""
    import zipfile

    import yaml as _yaml

    from getl_spark import lift

    whl = tmp_path / "getl_test_pkg-1.0-py3-none-any.whl"
    with zipfile.ZipFile(whl, "w") as z:
        z.writestr(
            "getl_test_pkg/__init__.py",
            "def double(x):\n    return x * 2\n",
        )
        z.writestr(
            "getl_test_pkg-1.0.dist-info/METADATA",
            "Metadata-Version: 2.1\nName: getl-test-pkg\nVersion: 1.0\n",
        )
        z.writestr(
            "getl_test_pkg-1.0.dist-info/WHEEL",
            "Wheel-Version: 1.0\nGenerator: test\nRoot-Is-Purelib: true\n"
            "Tag: py3-none-any\n",
        )
        z.writestr(
            "getl_test_pkg-1.0.dist-info/RECORD",
            "getl_test_pkg/__init__.py,,\n"
            "getl_test_pkg-1.0.dist-info/METADATA,,\n"
            "getl_test_pkg-1.0.dist-info/WHEEL,,\n"
            "getl_test_pkg-1.0.dist-info/RECORD,,\n",
        )

    def use_pkg(params):
        import getl_test_pkg  # resolvable ONLY via the pip-installed target

        df = params["dataframes"]["In"]
        return df.selectExpr(f"empid * {getl_test_pkg.double(1)} AS doubled")

    src = str(tmp_path / "src")
    sample_df.write.parquet(src)
    definition = {
        "LiftJob": {
            "In": {"Type": "load::batch_parquet", "Properties": {"Path": src}},
            "Use": {
                "Type": "custom::python_codeblock",
                "Input": ["In"],
                "Properties": {
                    "CustomFunction": "${fn}",
                    "Packages": [str(whl)],
                },
            },
        }
    }
    log = lift(spark, _yaml.safe_dump(definition, sort_keys=False), {"fn": use_pkg})
    assert sorted(r.doubled for r in log.get("Use").collect()) == [18, 20, 22]
