"""Fetch-layer logic tests — the reference's own listing fixture
(/root/reference/src/packages/fetch.rs:288-322) and URL/validation parity."""

from nem_mms_ray.mms.fetch import (
    download_plan,
    find_zip_urls,
    historic_url,
    listing_url,
    validate_month,
    validate_year,
)

LISTING_HTML = """
<html>
    <head><title>nemweb.com.au - /Reports/Current/Dispatch_SCADA/</title></head>
    <body>
        <H1>nemweb.com.au - /Reports/Current/Dispatch_SCADA/</H1>
        <pre>
            <A HREF="/Reports/Current/">[To Parent Directory]</A><br><br>
            ... &lt;dir&gt; <A HREF="/Reports/Current/Dispatch_SCADA/DUPLICATE/">DUPLICATE</A><br>
            ... 3157 <A HREF="/Reports/Current/Dispatch_SCADA/PUBLIC_DISPATCHSCADA_202112251045_0000000354978413.zip">PUBLIC_DISPATCHSCADA_202112251045_0000000354978413.zip</A><br>
            ... 3128 <A HREF="/Reports/Current/Dispatch_SCADA/PUBLIC_DISPATCHSCADA_202112251050_0000000354978611.zip">PUBLIC_DISPATCHSCADA_202112251050_0000000354978611.zip</A><br>
            ... 3145 <A HREF="/Reports/Current/Dispatch_SCADA/PUBLIC_DISPATCHSCADA_202112251055_0000000354978803.zip">PUBLIC_DISPATCHSCADA_202112251055_0000000354978803.zip</A><br>
            ... 3144 <A HREF="/Reports/Current/Dispatch_SCADA/PUBLIC_DISPATCHSCADA_202112251100_0000000354979009.zip">PUBLIC_DISPATCHSCADA_202112251100_0000000354979009.zip</A><br>
        </pre>
    </body>
</html>
"""


def test_find_zip_urls_matches_reference_fixture():
    urls = find_zip_urls(LISTING_HTML)
    assert urls == [
        "/Reports/Current/Dispatch_SCADA/PUBLIC_DISPATCHSCADA_202112251045_0000000354978413.zip",
        "/Reports/Current/Dispatch_SCADA/PUBLIC_DISPATCHSCADA_202112251050_0000000354978611.zip",
        "/Reports/Current/Dispatch_SCADA/PUBLIC_DISPATCHSCADA_202112251055_0000000354978803.zip",
        "/Reports/Current/Dispatch_SCADA/PUBLIC_DISPATCHSCADA_202112251100_0000000354979009.zip",
    ]


def test_year_month_validation():
    assert validate_year("2021") == "2021"
    assert validate_year("21") == "2021"
    assert validate_year("202") is None
    assert validate_year("20x1") is None
    assert validate_month("01") == "01"
    assert validate_month("12") == "12"
    assert validate_month("13") is None
    assert validate_month("0") is None
    assert validate_month("00") is None


def test_listing_urls():
    assert listing_url("DISPATCH_UNIT_SCADA", "current") == \
        "https://www.nemweb.com.au/Reports/Current/Dispatch_SCADA"
    assert listing_url("ROOFTOP_PV_ACTUAL", "archive") == \
        "https://www.nemweb.com.au/Reports/Archive/ROOFTOP_PV/ACTUAL"
    assert listing_url("NOPE", "current") is None
    assert listing_url("DISPATCH_UNIT_SCADA", "bogus") is None


def test_historic_url_template_and_support_matrix():
    url = historic_url("DISPATCH_UNIT_SCADA", "21", "04")
    assert url == (
        "https://www.nemweb.com.au/Data_Archive/Wholesale_Electricity/MMSDM/2021/"
        "MMSDM_2021_04/MMSDM_Historical_Data_SQLLoader/DATA/"
        "PUBLIC_DVD_DISPATCH_UNIT_SCADA_202104010000.zip"
    )
    # 3 of 6 packages support historic (fetch.rs:133-146)
    assert historic_url("DISPATCHPRICE", "2021", "04") is None
    assert historic_url("DISPATCH_LOCAL_PRICE", "2021", "04") is None
    assert historic_url("DISPATCH_NEGATIVE_RESIDUE", "2021", "04") is None
    assert historic_url("ROOFTOP_PV_FORECAST", "2021", "04") is not None
    assert historic_url("DISPATCH_UNIT_SCADA", "2021", "13") is None


def test_download_plan_create_new_targets():
    urls = find_zip_urls(LISTING_HTML)[:2]
    plan = download_plan(urls, "/tmp/raw")
    assert plan[0].url.startswith("https://www.nemweb.com.au/Reports/")
    assert plan[0].target == "/tmp/raw/PUBLIC_DISPATCHSCADA_202112251045_0000000354978413.zip"


def test_cli_info_and_packages(capsys):
    from nem_mms_ray.mms.__main__ import main

    assert main(["packages"]) == 0
    out = capsys.readouterr().out
    assert "DISPATCHPRICE" in out and len(out.splitlines()) == 6
    assert main(["info", "DISPATCH_LOCAL_PRICE"]) == 0
    assert "LOCALLY_CONSTRAINED: int8" in capsys.readouterr().out
    assert main(["info", "BOGUS"]) == 2
    assert main(["fetch", "DISPATCH_UNIT_SCADA", "historic", "--year", "21", "--month", "04"]) == 0
    assert "PUBLIC_DVD_DISPATCH_UNIT_SCADA_202104010000.zip" in capsys.readouterr().out
    assert main(["fetch", "DISPATCHPRICE", "historic"]) == 2
