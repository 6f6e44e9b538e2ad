"""S27: RTMC calc codegen + .rtmc2 screen XML editing (driver side)."""

import textwrap

from tern_ep_data_pipeline_spark import rtmc


def test_alias_sanitises_dashes():
    assert (
        rtmc.alias("Sws-10cm")
        == 'Alias(Sws_10cm,"DataFile:merged.Sws-10cm");'
    )


def test_single_variable_output():
    out = rtmc.variable(["Fsd"])
    assert out.aliases == ('Alias(Fsd,"DataFile:merged.Fsd");',)
    assert out.expression == "Fsd"
    assert out.text == 'Alias(Fsd,"DataFile:merged.Fsd");\r\nFsd'


def test_multi_variable_spatial_average():
    out = rtmc.variable(["Ts_1", "Ts_2"])
    assert out.expression == "AvgSpa(Ts_1,Ts_2)"
    assert len(out.aliases) == 2


def test_scaled_to_range_forces_absolute_start():
    out = rtmc.variable(["Fc"], scaled_to_range=True)
    assert out.expression == "(Fc - MinRun(Fc)) / (MaxRun(Fc) - MinRun(Fc))"
    assert out.start_condition == "StartAtRecord(0,0,OrderCollected);"
    assert out.text.startswith("StartAtRecord")


def test_cumulative_daily_total():
    out = rtmc.net_radiation(cumulative=True)
    assert "TotalOverTimeWithReset(" in out.expression
    assert "Fsd-Fsu+Fld-Flu" in out.expression
    assert ")*1800/10^6," in out.expression
    assert "Timestamp(Fsd)," in out.expression
    assert "RESET_DAILY" in out.expression


def test_energy_balance_residual_composes_unique_aliases():
    out = rtmc.energy_balance_residual(["Fg_1", "Fg_2"], ["Ts_1", "Ts_2"])
    # Rn(4) + Fh + Fe + plates(2) + soil T(2) + Cp constant, no duplicates
    assert len(out.aliases) == len(set(out.aliases)) == 11
    assert out.expression.startswith("Fsd-Fsu+Fld-Flu-")
    assert "Cp*(" in out.expression


def test_status_strings():
    assert (
        rtmc.comm_status("SiteLogger")
        == '"Server:__statistics__.SiteLogger_std.Collection State" > 2 '
    )
    assert rtmc.no_data_status("L", "T") == '"LinuxServer:L.T"'


SCREEN_XML = textwrap.dedent(
    """\
    <project>
      <Sources>
        <source name="DataFile">
          <settings file-name="/old/merged.dat"/>
        </source>
      </Sources>
      <Screens>
        <screen screen_name="Main">
          <Components>
            <component type="10101" name="CO2 flux">
              <calculation>old</calculation>
            </component>
            <component type="10806" name="a group">
              <Components>
                <component type="10606" name="wind rose">
                  <calculation>w</calculation>
                </component>
              </Components>
            </component>
          </Components>
        </screen>
      </Screens>
    </project>
    """
)


def test_project_roundtrip(tmp_path):
    p = tmp_path / "screen.rtmc2"
    p.write_text(SCREEN_XML)
    proj = rtmc.RtmcProject(str(p))

    assert [s.attrib["screen_name"] for s in proj.screens()] == ["Main"]
    # group descent: both the digital and the grouped wind rose are visible
    names = [c.attrib["name"] for c in proj.components("Main")]
    assert names == ["CO2 flux", "wind rose"]
    assert [
        c.attrib["name"] for c in proj.components("Main", "Wind Rose")
    ] == ["wind rose"]

    comp = proj.component("Main", "CO2 flux")
    assert proj.get_calculation(comp) == "old"
    proj.set_calculation(comp, rtmc.variable(["Fc"]).text)
    proj.set_source_file("DataFile", "/new/merged.dat")
    out = tmp_path / "edited.rtmc2"
    proj.write(str(out))

    re_read = rtmc.RtmcProject(str(out))
    assert "Alias(Fc" in re_read.get_calculation(
        re_read.component("Main", "CO2 flux")
    )
    src = re_read.root.find('./Sources/source[@name="DataFile"]/settings')
    assert src.attrib["file-name"] == "/new/merged.dat"
