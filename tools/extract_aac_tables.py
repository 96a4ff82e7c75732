"""Extract MPEG-4 AAC / SBR constant tables from the system libavcodec
static archive into dab_radio_tpu/dab/_aac_tables.npz.

These are ISO/IEC 14496-3 spec constants (Huffman codebooks, scalefactor-band
offsets, the SBR QMF prototype filter, the SBR noise table) — the same data
the reference ships via its vendored faad2 (vendor/, .gitmodules:1-30), which
is empty in this snapshot and cannot be fetched offline. The system
libavcodec.a carries them as named ELF objects; this tool slices them out by
symbol, resolving relocations for pointer-array tables.

Run:  python tools/extract_aac_tables.py            # regenerates the .npz
"""

import io
import json
import os
import subprocess
import sys
import tempfile

import numpy as np
from elftools.elf.elffile import ELFFile

ARCHIVE = "/usr/lib/x86_64-linux-gnu/libavcodec.a"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "dab_radio_tpu", "dab", "_aac_tables.npz")

# symbol -> (npz name, dtype); count inferred from symbol size
AACTAB = {}
for cb in range(1, 12):
    AACTAB[f"codes{cb}"] = (f"spectral_codes_{cb}", np.uint16)
    AACTAB[f"bits{cb}"] = (f"spectral_bits_{cb}", np.uint8)
AACTAB.update({
    "ff_aac_spectral_sizes": ("spectral_sizes", np.uint16),
    "ff_aac_scalefactor_code": ("scalefactor_codes", np.uint32),
    "ff_aac_scalefactor_bits": ("scalefactor_bits", np.uint8),
    "ff_aac_num_swb_960": ("num_swb_960", np.uint8),
    "ff_aac_num_swb_1024": ("num_swb_1024", np.uint8),
    "ff_aac_num_swb_120": ("num_swb_120", np.uint8),
    "ff_aac_num_swb_128": ("num_swb_128", np.uint8),
})
# every local swb_offset_{960,1024}_* table is uint16
AACSBR = {
    # NOTE: sbr_qmf_window_ds is .bss (runtime-decimated from _us) — derived
    # in aac_tables.sbr_qmf_window instead of extracted
    "sbr_qmf_window_us": ("sbr_qmf_window_us", np.float32),
    "ff_sbr_noise_table": ("sbr_noise_table", np.float32),
    "sbr_offset": ("sbr_offset", np.int8),
    "limgain": ("sbr_limgain", np.float32),
    "bw_tab": ("sbr_bw_tab", np.float32),
}
for dom in ("t", "f"):
    for name in ("env_1_5dB", "env_bal_1_5dB", "env_3_0dB", "env_bal_3_0dB",
                 "noise_3_0dB", "noise_bal_3_0dB"):
        if dom == "f" and "noise" in name:
            continue  # noise is time-domain coded only
        AACSBR[f"{dom}_huffman_{name}_codes"] = (
            f"sbr_{dom}_huff_{name}_codes", np.uint32)
        AACSBR[f"{dom}_huffman_{name}_bits"] = (
            f"sbr_{dom}_huff_{name}_bits", np.uint8)


def load_object(ar_path: str, member: str) -> bytes:
    return subprocess.run(["ar", "p", ar_path, member],
                          check=True, capture_output=True).stdout


class ObjectReader:
    def __init__(self, data: bytes):
        self.elf = ELFFile(io.BytesIO(data))
        self.symtab = self.elf.get_section_by_name(".symtab")
        self.by_name = {}
        for i, sym in enumerate(self.symtab.iter_symbols()):
            if sym["st_info"]["type"] == "STT_OBJECT" and sym.name:
                self.by_name.setdefault(sym.name, (i, sym))
        # index -> symbol for relocation resolution
        self.by_index = {i: s for i, s in
                         enumerate(self.symtab.iter_symbols())}
        # section -> {offset: (target symbol name, addend)}
        self.relocs = {}
        for sec in self.elf.iter_sections():
            if sec.name.startswith(".rela"):
                target = sec.name[len(".rela"):]
                m = self.relocs.setdefault(target, {})
                for rel in sec.iter_relocations():
                    tsym = self.by_index[rel["r_info_sym"]]
                    m[rel["r_offset"]] = (tsym.name, tsym["st_value"],
                                          rel["r_addend"],
                                          tsym["st_shndx"])

    def raw(self, name: str) -> bytes:
        _, sym = self.by_name[name]
        sec = self.elf.get_section(sym["st_shndx"])
        off = sym["st_value"]
        return sec.data()[off:off + sym["st_size"]]

    def array(self, name: str, dtype) -> np.ndarray:
        buf = self.raw(name)
        item = np.dtype(dtype).itemsize
        n = len(buf) // item
        return np.frombuffer(buf[:n * item], dtype=dtype).copy()

    def pointer_array(self, name: str):
        """Resolve a pointer-array symbol into the list of local symbol
        names each slot points at (via RELA relocations)."""
        _, sym = self.by_name[name]
        sec = self.elf.get_section(sym["st_shndx"])
        secname = sec.name
        rel = self.relocs.get(secname, {})
        out = []
        for slot in range(sym["st_size"] // 8):
            off = sym["st_value"] + slot * 8
            if off not in rel:
                raise KeyError(f"{name}[{slot}]: no relocation at {off:#x}")
            tname, tval, addend, tshndx = rel[off]
            if not tname:  # section symbol: find covering object symbol
                tname = self._sym_at(tshndx, tval + addend)
            out.append(tname)
        return out

    def _sym_at(self, shndx: int, value: int) -> str:
        for sym in self.symtab.iter_symbols():
            if (sym["st_info"]["type"] == "STT_OBJECT"
                    and sym["st_shndx"] == shndx
                    and sym["st_value"] <= value
                    < sym["st_value"] + max(sym["st_size"], 1)):
                return sym.name
        raise KeyError(f"no object symbol at section {shndx}+{value:#x}")


# (name, shape): the .bss tables ff_ps_init fills, in dump order
_PS_BSS = [
    ("f20_0_8", (8, 8, 2)), ("f34_0_12", (8, 12, 2)),
    ("f34_1_8", (8, 8, 2)), ("f34_2_4", (8, 4, 2)),
    ("Q_fract_allpass", (2, 50, 3, 2)), ("phi_fract", (2, 50, 2)),
    ("HA", (46, 8, 4)), ("HB", (46, 8, 4)),
    ("pd_re_smooth", (512,)), ("pd_im_smooth", (512,)),
]

_PS_DUMP_C = """
#include <stdio.h>
extern void ff_ps_init(void);
%s
int main(void) {
    ff_ps_init();
%s
    return 0;
}
"""

_PS_STUB_C = """
int ff_init_vlc_sparse(void) { return 0; }
void av_log(void) {}
void ff_psdsp_init(void) {}
const unsigned char ff_log2_tab[256] = {0};
"""


def _run_ps_tablegen():
    with tempfile.TemporaryDirectory() as td:
        for member in ("aacps_float.o", "aacps_common.o"):
            with open(os.path.join(td, member), "wb") as f:
                f.write(load_object(ARCHIVE, member))
        glob_flags = [f"--globalize-symbol={n}" for n, _ in _PS_BSS]
        subprocess.run(["objcopy", *glob_flags, "aacps_float.o",
                        "aacps_float_g.o"], cwd=td, check=True)
        decls, writes = [], []
        for name, shape in _PS_BSS:
            dims = "".join(f"[{d}]" for d in shape)
            decls.append(f"extern float {name}{dims};")
            writes.append(f"    fwrite({name}, sizeof({name}), 1, stdout);")
        with open(os.path.join(td, "dump.c"), "w") as f:
            f.write(_PS_DUMP_C % ("\n".join(decls), "\n".join(writes)))
        with open(os.path.join(td, "stub.c"), "w") as f:
            f.write(_PS_STUB_C)
        subprocess.run(["gcc", "-no-pie", "-o", "dump", "dump.c",
                        "aacps_float_g.o", "aacps_common.o", "stub.c", "-lm"],
                       cwd=td, check=True)
        raw = subprocess.run([os.path.join(td, "dump")], check=True,
                             capture_output=True).stdout
    buf = np.frombuffer(raw, np.float32)
    out, off = {}, 0
    for name, shape in _PS_BSS:
        n = int(np.prod(shape))
        out[name] = buf[off:off + n].reshape(shape).copy()
        assert np.count_nonzero(out[name]) > 0, f"ps tablegen: {name} empty"
        off += n
    assert off == buf.shape[0], (off, buf.shape)
    return out


def main():
    tables = {}
    manifest = {}

    aactab = ObjectReader(load_object(ARCHIVE, "aactab.o"))
    for sym, (name, dtype) in AACTAB.items():
        tables[name] = aactab.array(sym, dtype)
    for sym in aactab.by_name:
        if sym.startswith("swb_offset_"):
            tables[sym] = aactab.array(sym, np.uint16)
    # pointer arrays: which per-rate table each sampling-frequency index uses
    for parr in ("ff_swb_offset_960", "ff_swb_offset_1024",
                 "ff_swb_offset_120", "ff_swb_offset_128"):
        manifest[parr] = aactab.pointer_array(parr)

    aacsbr = ObjectReader(load_object(ARCHIVE, "aacsbr.o"))
    for sym, (name, dtype) in AACSBR.items():
        # local-symbol suffixes like "bw_tab.1" — match by prefix
        cands = [s for s in aacsbr.by_name
                 if s == sym or s.startswith(sym + ".")]
        assert len(cands) == 1, (sym, cands)
        if name.endswith("_codes"):
            # ffmpeg sizes each code table to the narrowest type that fits;
            # entry count always equals the matching _bits table's length
            raw = aacsbr.raw(cands[0])
            nbits = len(aacsbr.raw(cands[0].replace("codes", "bits")))
            dtype = {1: np.uint8, 2: np.uint16, 4: np.uint32}[
                len(raw) // nbits]
        tables[name] = aacsbr.array(cands[0], dtype).astype(np.uint32) \
            if name.endswith("_codes") else aacsbr.array(cands[0], dtype)
    tables["sbr_noise_table"] = tables["sbr_noise_table"][:1024].reshape(512, 2)
    tables["sbr_offset"] = tables["sbr_offset"].reshape(6, 16)

    # ---- parametric stereo (aacps_float.o + aacps_common.o) ----
    ps_float = ObjectReader(load_object(ARCHIVE, "aacps_float.o"))
    ps_common = ObjectReader(load_object(ARCHIVE, "aacps_common.o"))
    PS_FLOAT = {
        "phi_fract": np.float32, "Q_fract_allpass": np.float32,
        "HA": np.float32, "HB": np.float32,
        "pd_re_smooth": np.float32, "pd_im_smooth": np.float32,
        "f34_0_12": np.float32, "f34_1_8": np.float32,
        "f34_2_4": np.float32, "f20_0_8": np.float32,
        "ipdopd_cos": np.float32, "ipdopd_sin": np.float32,
        "iid_par_dequant": np.float32, "acos_icc_invq": np.float32,
        "icc_invq": np.float32, "f_center_20": np.int8,
        "f_center_34": np.int8, "fractional_delay_links": np.float32,
        "g0_Q8": np.float32, "g0_Q12": np.float32, "g1_Q8": np.float32,
        "g2_Q4": np.float32,
    }
    for sym, dtype in PS_FLOAT.items():
        cands = [s for s in ps_float.by_name
                 if s == sym or s.startswith(sym + ".")]
        assert len(cands) == 1, (sym, cands)
        tables[f"ps_{sym}"] = ps_float.array(cands[0], dtype)
    PS_HUFF = ["iid_df1", "iid_dt1", "iid_df0", "iid_dt0", "icc_df",
               "icc_dt", "ipd_df", "ipd_dt", "opd_df", "opd_dt"]
    for name in PS_HUFF:
        bits = ps_common.array(f"huff_{name}_bits", np.uint8)
        raw = ps_common.raw(f"huff_{name}_codes")
        item = len(raw) // len(bits)
        dtype = {1: np.uint8, 2: np.uint16, 4: np.uint32}[item]
        tables[f"ps_huff_{name}_codes"] = ps_common.array(
            f"huff_{name}_codes", dtype).astype(np.uint32)
        tables[f"ps_huff_{name}_bits"] = bits
    for sym in ("num_env_tab", "nr_iidicc_par_tab", "nr_iidopd_par_tab",
                "huff_offset", "huff_iid", "ff_k_to_i_34", "ff_k_to_i_20"):
        tables[f"ps_{sym}"] = ps_common.array(sym, np.uint8)

    # The PS filterbank / decorrelator / mixing tables live in .bss and are
    # generated at runtime by ff_ps_init (aacps_tablegen): link the archive
    # objects into a dump executable, RUN the real tablegen, and capture the
    # exact float tables libavcodec uses.
    for name, arr in _run_ps_tablegen().items():
        tables[f"ps_{name}"] = arr

    tables["_manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    np.savez_compressed(OUT, **tables)
    print(f"wrote {OUT}: {len(tables)} tables, "
          f"{os.path.getsize(OUT) / 1024:.1f} KiB")
    for k in sorted(tables):
        v = tables[k]
        print(f"  {k}: shape={v.shape} dtype={v.dtype}")


if __name__ == "__main__":
    sys.exit(main())
