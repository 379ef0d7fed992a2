set output '<OUTDIR>/in.fq.GC.histogram.png'
set terminal png nocrop enhanced font arial 10 size 640,360
set ylabel 'Number of reads'
set xlabel 'GC content (%)'
set ytics border in scale 1,0.5 mirror norotate  offset character 0, 0, 0
set title 'GC Content Histogram'
set xrange [ 0 : 100 ] noreverse nowriteback
set autoscale y
set lmargin '10'
set rmargin '4'
set tmargin '3'
set bmargin '4'
plot '<OUTDIR>/in.fq.GC.histogram.data' using 1:2 title '' with boxes
