#!/bin/bash
# Stock-libopus oracle: original celt_decoder.c / opus_decoder.c (PLC +
# transition machinery intact — the fork strips them in *_clean.c, so the
# fork build SEGFAULTS on CELT->SILK mode transitions), opusfile + libogg
# from the reference third_party, NQOR dumper (tools/stock_oracle_main.c).
# Used by tests/test_analysis.py::test_auto_encode_reference_oracle.
# opusfile + libogg from the reference's third_party, small NQOR dumper.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
TP=/root/reference/third_party
OUT=/tmp/stockopus
rm -rf $OUT
mkdir -p $OUT/obj
CFLAGS="-O2 -fPIC -DOPUS_BUILD -DUSE_ALLOCA -DENABLE_FFT_TEST -DHAVE_LRINT -DHAVE_LRINTF \
  -I$TP/opus/libopus/include -I$TP/opus/libopus/src -I$TP/opus/celt \
  -I$TP/opus/silk -I$TP/opus/silk/float -I$TP/opus/silk/fixed \
  -I$TP/libogg/include -I$TP/opus/opusfile/include -I$TP/opus/opusfile/src/include -w"
cd $OUT/obj
n=0
for f in $TP/opus/celt/*.c $TP/opus/silk/*.c $TP/opus/silk/float/*.c \
         $TP/opus/libopus/src/*.c $TP/opus/opusfile/src/*.c \
         $TP/libogg/src/*.c; do
  b=$(basename $f .c)
  case $b in
    celt_decoder_clean|opus_decoder_clean|opus_demo|opus_custom_demo|repacketizer_demo|trivial_example|\
    opus_compare|http|wincerts|winerrno|test*) continue;;
  esac
  gcc $CFLAGS -DOP_DISABLE_HTTP -c $f -o ${b}_$n.o &
  n=$((n+1))
  if (( n % 8 == 0 )); then wait; fi
done
wait
gcc -O2 -I$TP/opus/opusfile/include -I$TP/opus/libopus/include -I$TP/libogg/include -w \
  $HERE/stock_oracle_main.c $OUT/obj/*.o -lm -o $OUT/oracle_dump
echo BUILT $OUT/oracle_dump

# Also build the raw-packet probe (PLC / transition validation):
TP=/root/reference/third_party
gcc -O2 -I$TP/opus/libopus/include -w \
  $HERE/opus_pkt_probe.c \
  $(ls /tmp/stockopus/obj/*.o | grep -v opusfile | grep -v info_ \
     | grep -v internal_ | grep -v stream_ | grep -v framing \
     | grep -v bitwise) -lm -o /tmp/stockopus/opus_pkt_probe
echo BUILT /tmp/stockopus/opus_pkt_probe
